"""Operator namespace (re-exports; implementations live in the flat
modules whose docstrings carry the reference file:line citations).

decode/beam DP -> ocular_spark.decoder; transitions ->
decoder.CompiledTransitionModel / cstransition / markov_offset;
EM aggregations -> ocular_spark.em; preprocessing -> preprocess;
dedup/similarity/text-analysis operators -> __spark_entry__ queries."""

from ocular_spark.decoder import (  # noqa: F401
    CompiledTransitionModel,
    Decoder,
    DenseBigramModel,
    TemplateStack,
    build_emission_cache,
    build_emission_cache_explicit,
    coarse_backward,
)
from ocular_spark.cstransition import CodeSwitchTransitionModel  # noqa: F401
from ocular_spark.markov_offset import MarkovOffsetTransitionModel  # noqa: F401
from ocular_spark.em import (  # noqa: F401
    CountsBundle,
    apply_font_mstep,
    reestimate_lm,
    run_estep,
    train_font,
)
from ocular_spark.preprocess import (  # noqa: F401
    binarize_global,
    binarize_local,
    crop,
    extract_lines,
    prepare_page,
    straighten,
)
