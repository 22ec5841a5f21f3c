"""EM font training (hard EM over page decodes).

Re-expresses ``train/FontTrainer.java`` (tberg12/ocular) Spark-first:

  * E-step — the decode kernel additionally accumulates per-character
    emission/width count tensors (CachingEmissionModel.incrementCounts
    :336-352, CharacterTemplate.incrementCounts :271-276) and n-gram
    token tables of the decoded text (for LM re-estimation,
    FontTrainer.reestimateLM :340-424).  Each Spark partition emits one
    :class:`CountsBundle`; bundles merge by plain summation, so they
    combine via **RDD treeAggregate** (north_star requirement) — no
    driver-side loop over documents.
  * M-step — driver-side: L-BFGS refit per character template
    (CharacterTemplate.updateParameters :278-281), width gaussian refit,
    optional LM interpolation at weight 0.5 (:209-216 of reestimateLM),
    then re-broadcast.
  * Batching — the reference's batch-complete rule ported verbatim
    (FontTrainer.isBatchComplete :272-285, incl. remainder lumping).
  * Checkpoint/resume — models written per (iter, batch);
    ``continue_from_last_complete_iteration`` scans for the newest
    complete iteration (train/TrainingRestarter.java:28-87).
"""

from __future__ import annotations

import os
import pickle
from typing import Dict, Iterator, List, Optional, Sequence, Tuple

import numpy as np

from ocular_spark.decoder import Decoder, LineDecode
from ocular_spark.font import Font, LINE_HEIGHT, BLACK, WHITE
from ocular_spark.lm import (
    KNESER_NEY,
    InterpolatingSingleLanguageModel,
    NgramLanguageModel,
    derive_count_db,
    merge_token_tables,
    token_tables_from_lines,
)
from ocular_spark.pipeline import ModelBundle, get_decoder, unpack_line
from ocular_spark.transcriptions import assemble


class CountsBundle:
    """Mergeable E-step sufficient statistics (one per partition)."""

    def __init__(self, max_order: int) -> None:
        # (char_idx, exposure, width) -> (2, width, LINE_HEIGHT) float64
        # rows: [black, white]
        self.emission: Dict[Tuple[int, int, int], np.ndarray] = {}
        # char_idx -> {width: count}
        self.width: Dict[int, Dict[int, float]] = {}
        self.token_tables: List[Dict[Tuple[int, ...], int]] = [
            {} for _ in range(max_order)
        ]
        # per-language token tables (multilingual hard-EM,
        # FontTrainer.separateTranscriptionsByLanguage :388-424):
        # lang index -> per-order tables over that language's runs
        self.lang_token_tables: Dict[int, List[Dict[Tuple[int, ...], int]]] = {}
        self.max_order = max_order
        self.n_pages = 0
        self.joint_log_prob = 0.0
        # GSM sufficient statistics (A6): raw Viterbi (lang, lmChar,
        # glyph) counts WITHOUT the smoothing prior (the factory adds
        # smoothing when `make` is called on the driver), summed as a
        # dense (L, C, C+5) tensor
        self.gsm_counts: Optional[np.ndarray] = None

    def merge(self, other: "CountsBundle") -> "CountsBundle":
        for k, v in other.emission.items():
            cur = self.emission.get(k)
            if cur is None:
                self.emission[k] = v.copy()
            else:
                cur += v
        for c, wd in other.width.items():
            mine = self.width.setdefault(c, {})
            for w, n in wd.items():
                mine[w] = mine.get(w, 0.0) + n
        self.token_tables = merge_token_tables(self.token_tables, other.token_tables)
        for lang, tables in other.lang_token_tables.items():
            mine_l = self.lang_token_tables.get(lang)
            self.lang_token_tables[lang] = (
                merge_token_tables(mine_l, tables) if mine_l is not None
                else [dict(t) for t in tables]
            )
        if other.gsm_counts is not None:
            if self.gsm_counts is None:
                self.gsm_counts = other.gsm_counts.copy()
            else:
                self.gsm_counts += other.gsm_counts
        self.n_pages += other.n_pages
        self.joint_log_prob += other.joint_log_prob
        return self

    def dumps(self) -> bytes:
        return pickle.dumps(self, protocol=4)

    @staticmethod
    def loads(raw: bytes) -> "CountsBundle":
        return pickle.loads(raw)


def accumulate_page_counts(
    bundle: CountsBundle,
    decodes: Sequence[LineDecode],
    obs_lines: Sequence[np.ndarray],
    space_idx: int,
    count: float = 1.0,
) -> None:
    """emissionModel.incrementCounts over one decoded page
    (DecoderEM.incrementCounts :164-176 -> CachingEmissionModel
    :336-352).  Uses the (exposure, offset, pad) recovered from the
    cache argmaxes; template width tw = width - pad."""
    for ld, obs in zip(decodes, obs_lines):
        n = len(ld.states)
        for i in range(n):
            c = int(ld.glyph_chars[i])
            w = int(ld.widths[i])
            pad = int(ld.pad_widths[i])
            tw = w - pad
            t0 = int(ld.start_cols[i])
            e = int(ld.exposures[i])
            off = int(ld.offsets[i])
            if tw <= 0:
                continue
            # width counts (space included; space emission skipped)
            wd = bundle.width.setdefault(c, {})
            wd[tw] = wd.get(tw, 0.0) + count
            if c == space_idx:
                continue
            key = (c, e, tw)
            arr = bundle.emission.get(key)
            if arr is None:
                arr = np.zeros((2, tw, LINE_HEIGHT))
                bundle.emission[key] = arr
            seg = obs[t0 : t0 + tw]
            j = np.clip(np.arange(LINE_HEIGHT) + off, 0, LINE_HEIGHT - 1)
            np.add.at(arr[0], (slice(None), j), (seg == BLACK) * count)
            np.add.at(arr[1], (slice(None), j), (seg == WHITE) * count)


def separate_runs_by_language(
    running: Sequence[str], langs: Sequence[int], n_langs: int
) -> Dict[int, List[List[str]]]:
    """FontTrainer.separateTranscriptionsByLanguage (:388-424) over one
    document's running normalized charLang sequence: split into
    maximal same-language runs (consecutive duplicate spaces dropped
    within a run); a lang of -1 maps to 0 when there is exactly one
    language (the reference's null-language monolingual case)."""
    out: Dict[int, List[List[str]]] = {}
    prev_lang: Optional[int] = None
    cur: List[str] = []

    def flush() -> None:
        if cur:
            lang = prev_lang if prev_lang is not None else -1
            if lang < 0:
                if n_langs == 1:
                    lang = 0
                else:
                    return  # no language attribution — reference would crash
            out.setdefault(lang, []).append(list(cur))

    for ch, lang in zip(running, langs):
        if prev_lang is None or lang != prev_lang:
            flush()
            cur = []
            prev_lang = lang
        if ch != " " or not cur or cur[-1] != " ":
            cur.append(ch)
    flush()
    return out


def accumulate_lm_counts(
    bundle: CountsBundle, decodes: Sequence[LineDecode], char_strs: Sequence[str],
    n_langs: int = 1,
) -> None:
    """Count n-grams of the decoded running normalized text
    (distributive token tables; cascade derived on the driver by
    derive_count_db).  The combined tables feed monolingual
    re-estimation; the per-language split (reference
    separateTranscriptionsByLanguage) feeds per-language KN rebuilds."""
    tr = assemble(decodes, char_strs)
    str_to_idx = {s: i for i, s in enumerate(char_strs)}
    indexed = [str_to_idx[ch] for ch in tr.normalized_running]
    if indexed:
        new = token_tables_from_lines([indexed], bundle.max_order)
        bundle.token_tables = merge_token_tables(bundle.token_tables, new)
    runs = separate_runs_by_language(
        tr.normalized_running, tr.normalized_running_langs, n_langs
    )
    for lang, passages in runs.items():
        lines = [[str_to_idx[ch] for ch in p] for p in passages]
        new_l = token_tables_from_lines(lines, bundle.max_order)
        cur = bundle.lang_token_tables.get(lang)
        bundle.lang_token_tables[lang] = (
            merge_token_tables(cur, new_l) if cur is not None else new_l
        )


def accumulate_gsm_counts(
    bundle: CountsBundle,
    decodes: Sequence[LineDecode],
    char_strs: Sequence[str],
    n_langs: int,
) -> None:
    """GSM E-step counts over the full Viterbi state sequence
    (gsm/BasicGlyphSubstitutionModel.incrementCounts :234-257, applied
    to FontTrainer.makeFullViterbiStateSeq output)."""
    from ocular_spark.gsm import N_SPECIAL_GLYPHS, NORMAL_CHAR
    from ocular_spark.transcriptions import make_full_viterbi_state_seq
    from ocular_spark.decoder import RMRGN_HPHN_INIT, TMPL

    C = len(char_strs)
    if bundle.gsm_counts is None:
        bundle.gsm_counts = np.zeros((n_langs, C, C + N_SPECIAL_GLYPHS))
    space_idx = char_strs.index(" ")
    hyphen_idx = char_strs.index("-") if "-" in char_strs else -1
    for li, i in make_full_viterbi_state_seq(decodes, char_strs):
        ld = decodes[li]
        lang = int(ld.langs[i])
        if lang < 0:
            continue
        stype = int(ld.types[i])
        gtype = int(ld.glyph_types[i])
        tmpl_char = int(ld.glyph_chars[i])
        glyph = tmpl_char if gtype == NORMAL_CHAR else C + gtype
        if stype == TMPL:
            bundle.gsm_counts[lang, int(ld.lm_chars[i]), glyph] += 1
        elif stype == RMRGN_HPHN_INIT and tmpl_char == space_idx and hyphen_idx >= 0:
            bundle.gsm_counts[lang, hyphen_idx, glyph] += 1


def estep_kernel(bundle_bc, char_strs: List[str], max_order: int):
    """mapInPandas kernel: page rows -> ONE row per partition with the
    pickled CountsBundle (partial aggregate; map-side combine)."""
    import pandas as pd

    def fn(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        bundle_models: ModelBundle = (
            bundle_bc.value if hasattr(bundle_bc, "value") else bundle_bc
        )
        decoder = get_decoder(bundle_models)
        space_idx = decoder.tm.space
        counts = CountsBundle(max_order)
        for pdf in batches:
            for lines in pdf["lines"]:
                imgs = [unpack_line(raw) for raw in lines]
                decodes, log_prob = decoder.decode_document(imgs)
                n_langs = getattr(decoder.tm, "n_langs", 1)
                accumulate_page_counts(counts, decodes, imgs, space_idx)
                accumulate_lm_counts(counts, decodes, char_strs, n_langs)
                accumulate_gsm_counts(counts, decodes, char_strs, n_langs)
                counts.n_pages += 1
                counts.joint_log_prob += log_prob
        yield pd.DataFrame({"blob": [counts.dumps()]})

    return fn


def run_estep(
    spark,
    pages_df,
    bundle_bc,
    char_strs: List[str],
    max_order: int,
    num_partitions: Optional[int] = None,
) -> CountsBundle:
    """Distributed E-step: page-salted repartition -> per-partition
    partial counts -> treeAggregate merge to the driver."""
    from pyspark.sql import functions as F

    if num_partitions is None:
        num_partitions = int(spark.conf.get("spark.sql.shuffle.partitions", "32"))
    salted = pages_df.repartition(num_partitions, F.col("media_ref"))
    blobs = salted.mapInPandas(
        estep_kernel(bundle_bc, char_strs, max_order), schema="blob binary"
    )
    zero = CountsBundle(max_order)
    return blobs.rdd.treeAggregate(
        zero,
        lambda acc, row: acc.merge(CountsBundle.loads(row.blob)),
        lambda a, b: a.merge(b),
        depth=2,
    )


def apply_font_mstep(font: Font, counts: CountsBundle, char_strs: Sequence[str]) -> Font:
    """Driver M-step: load counts into templates, refit widths + LBFGS
    (FontTrainer.updateFontParameters :306-318).  Mutates and returns
    ``font`` (the reference updates templates in place)."""
    for c_idx, c_str in enumerate(char_strs):
        template = font.get(c_str)
        template.clear_counts()
        touched = False
        wd = counts.width.get(c_idx)
        if wd:
            for tw, n in wd.items():
                if template.min_width <= tw <= template.max_width:
                    template.increment_width_counts(tw, n)
                    touched = True
        if not template.is_space:
            for (cc, e, tw), arr in counts.emission.items():
                if cc != c_idx:
                    continue
                if not (template.min_width <= tw <= template.max_width):
                    continue
                w_i = tw - template.min_width
                template.black_counts[e][w_i] += arr[0]
                template.white_counts[e][w_i] += arr[1]
                template.count_sparsity[e, w_i] = True
                touched = True
        if touched:
            template.update_parameters()
    return font


def reestimate_lm(lm, counts: CountsBundle, interp_weight: float = 0.5):
    """Monolingual analog of FontTrainer.reestimateLM (:340-424):
    KN LM over the decoded text interpolated with the base at 0.5."""
    total_tokens = sum(counts.token_tables[0].values()) if counts.token_tables else 0
    if total_tokens == 0:
        return lm
    base = lm
    if isinstance(base, InterpolatingSingleLanguageModel):
        base = base.sub_models[0]
    dbs = derive_count_db(counts.token_tables)
    new_lm = NgramLanguageModel(
        base.get_character_indexer(),
        dbs,
        base.get_active_characters(),
        KNESER_NEY,
        base.lm_power,
    )
    return InterpolatingSingleLanguageModel(
        [(base, 1.0 - interp_weight), (new_lm, interp_weight)]
    )


def reestimate_cslm(cslm, counts: CountsBundle, interp_weight: float = 0.5):
    """Per-language LM re-estimation for multilingual hard-EM —
    FontTrainer.reestimateLM (train/FontTrainer.java:340-386): for each
    language with decoded characters, rebuild a KN LM over that
    language's runs and interpolate with the base at `interp_weight`;
    languages absent from the transcription keep their base LM.  New
    language priors are proportional to decoded chars + 1 (smoothing),
    normalized by the BasicCodeSwitchLanguageModel constructor."""
    from ocular_spark.lm import BasicCodeSwitchLanguageModel

    ci = cslm.get_character_indexer()
    lms_and_priors = []
    for lang in range(cslm.num_languages()):
        base = cslm.get(lang)
        if isinstance(base, InterpolatingSingleLanguageModel):
            base = base.sub_models[0]
        tables = counts.lang_token_tables.get(lang)
        total = sum(tables[0].values()) if tables else 0
        if total > 0:
            # lang tables are counted at the GLOBAL max order; the
            # reference counts each language at its own base LM's
            # ngramLength (FontTrainer.java:357) — truncate so the
            # interpolated model keeps the base's order even when
            # per-language orders differ
            dbs = derive_count_db(tables[: base.get_max_order()])
            new_lm = NgramLanguageModel(
                ci, dbs, base.get_active_characters(), KNESER_NEY, base.lm_power
            )
            updated = InterpolatingSingleLanguageModel(
                [(base, 1.0 - interp_weight), (new_lm, interp_weight)]
            )
        else:
            updated = base
        lms_and_priors.append((updated, total + 1.0))
    return BasicCodeSwitchLanguageModel(
        lms_and_priors, ci, cslm.lang_names, cslm.get_prob_keep_same_language()
    )


def is_batch_complete(
    num_usable_docs: int,
    doc_num: int,
    current_batch_size: int,
    update_doc_batch_size: int,
    no_update_if_batch_too_small: bool = False,
) -> bool:
    """FontTrainer.isBatchComplete (:272-285), ported verbatim —
    affects which docs see which model, so parity during training
    depends on it."""
    if doc_num + 1 == num_usable_docs:  # last document of the set
        return (not no_update_if_batch_too_small) or (
            current_batch_size >= update_doc_batch_size
        )
    if num_usable_docs - (doc_num + 1) < update_doc_batch_size:
        return False  # lump the remainder into this batch
    return current_batch_size == update_doc_batch_size


def num_batches(n_docs: int, update_doc_batch_size: int) -> int:
    """Number of contiguous batches under the reference's
    isBatchComplete rule: floor(n/batch) slices of size `batch`, with
    the remainder lumped into the LAST batch (FontTrainer.java:272-285)."""
    if update_doc_batch_size <= 0 or n_docs <= update_doc_batch_size:
        return 1
    return n_docs // update_doc_batch_size


def assign_batches(pages_df, update_doc_batch_size: "Optional[int]"):
    """Materialize a ``batch_id`` column reproducing the reference's
    contiguous-slice batch semantics (FontTrainer.java:272-285: n//b
    slices, remainder lumped into the last) with NO single-task stage.
    Returns ``(pages_with_batch_id, n_batches, n_docs)`` — the total
    row count falls out of the offsets prefix-sum for free, so callers
    (train_font) never run a separate ``count()`` job.
    ``update_doc_batch_size=None`` means "one batch over everything"
    (the reference's default when updateDocBatchSize is unset).

    Distributed global ranking (the zipWithIndex pattern, expressed in
    DataFrame ops):
      1. range-partition the keys-only projection on (doc_id,
         media_ref) — a distributed sort, every partition holds a
         contiguous key range;
      2. rank WITHIN each partition (window partitioned by
         spark_partition_id — parallel, never Exchange SinglePartition);
      3. collect only the per-partition COUNTS (<= num_partitions rows),
         prefix-sum them on the driver, and broadcast-join the offsets
         back: global rank = partition offset + local rank.

    The round-1 implementation collected every key to the driver
    (driver OOM at 10^12 docs); the round-2 one used a partitionBy-less
    Window.orderBy (one task sorts every key).  This version's widest
    per-task state is one partition's worth of (doc_id, media_ref)
    pairs — never the image payload, never the whole key set."""
    from pyspark.sql import functions as F
    from pyspark.sql.window import Window

    spark = pages_df.sparkSession
    # explicit partition count: AQE must not re-coalesce between the
    # offsets collect and the final join (pid values have to agree)
    n_parts = int(spark.conf.get("spark.sql.shuffle.partitions", "32"))
    keys = (
        pages_df.select("doc_id", "media_ref")
        .repartitionByRange(n_parts, "doc_id", "media_ref")
        .withColumn("pid", F.spark_partition_id())
    )
    w_local = Window.partitionBy("pid").orderBy("doc_id", "media_ref")
    local = keys.withColumn("local_rank", F.row_number().over(w_local) - 1)
    sizes = sorted(
        (r["pid"], r["cnt"])
        for r in local.groupBy("pid").agg(F.count(F.lit(1)).alias("cnt")).collect()
    )
    offsets, acc = [], 0
    for pid, cnt in sizes:
        offsets.append((pid, acc))
        acc += cnt
    n_docs = acc  # the prefix-sum total IS the row count: no extra job
    if update_doc_batch_size is None or update_doc_batch_size <= 0:
        update_doc_batch_size = max(n_docs, 1)
    n_b = num_batches(n_docs, update_doc_batch_size)
    off_df = F.broadcast(
        spark.createDataFrame(offsets, schema="pid int, pid_offset long")
    )
    keyed = (
        local.join(off_df, "pid")
        .withColumn(
            "batch_id",
            F.least(
                F.floor(
                    (F.col("pid_offset") + F.col("local_rank"))
                    / update_doc_batch_size
                ).cast("int"),
                F.lit(n_b - 1),
            ),
        )
        .select("doc_id", "media_ref", "batch_id")
    )
    return pages_df.join(keyed, ["doc_id", "media_ref"]), n_b, n_docs


def _font_path(out_dir: str, it: int, batch: int) -> str:
    return os.path.join(out_dir, "font_iter-%02d_batch-%02d.fontnpz" % (it, batch))


def _lm_path(out_dir: str, it: int, batch: int) -> str:
    return os.path.join(out_dir, "lm_iter-%02d_batch-%02d.pkl" % (it, batch))


def _gsm_path(out_dir: str, it: int, batch: int) -> str:
    return os.path.join(out_dir, "gsm_iter-%02d_batch-%02d.pkl" % (it, batch))


def find_last_complete_iteration(out_dir: str, num_iters: int) -> int:
    """TrainingRestarter.getRestartModels scan (:28-87, simplified to
    whole-iteration granularity: resume from the newest iter whose
    final-batch font artifact exists)."""
    last = 0
    if not os.path.isdir(out_dir):
        return 0
    names = set(os.listdir(out_dir))
    for it in range(1, num_iters + 1):
        if any(n.startswith("font_iter-%02d_" % it) and n.endswith(".final") for n in names):
            last = it
    return last


def train_font(
    spark,
    pages_df,
    font: Font,
    lm,
    char_strs: List[str],
    num_em_iters: int = 3,
    update_doc_batch_size: Optional[int] = None,
    beam_size: int = 10,
    out_dir: Optional[str] = None,
    reestimate_lm_too: bool = False,
    continue_from_last_complete_iteration: bool = False,
    num_partitions: Optional[int] = None,
    tm_factory=None,
    gsm_factory=None,
    gsm=None,
):
    """FontTrainer.trainFont (:56-134) driver loop.

    pages_df: (doc_id, media_ref, lines: array<binary>) — one row per
    page.  Batching is in *pages* (our document == one page, matching
    LazyRawPdfImageDocument's page expansion).  Each batch: Spark
    E-step job -> treeAggregate -> driver M-step -> re-broadcast ->
    checkpoint artifact (the Iceberg-snapshot analog: atomic files
    keyed by (iter, batch))."""
    max_order = (
        lm.get_max_order()
        if hasattr(lm, "get_max_order")
        else max(lm.get(k).get_max_order() for k in range(lm.num_languages()))
    )

    start_iter = 0
    if continue_from_last_complete_iteration and out_dir:
        start_iter = find_last_complete_iteration(out_dir, num_em_iters)
        if start_iter > 0:
            font = Font.load_npz(
                _font_path(out_dir, start_iter, 0) + ".final"
            )
            lm_file = _lm_path(out_dir, start_iter, 0) + ".final"
            if os.path.exists(lm_file):
                with open(lm_file, "rb") as f:
                    lm = pickle.load(f)
            # a resumed multilingual run must not restart from the
            # initial GSM (the reference's TrainingRestarter reloads
            # all three models)
            gsm_file = _gsm_path(out_dir, start_iter, 0) + ".final"
            if os.path.exists(gsm_file):
                with open(gsm_file, "rb") as f:
                    gsm = pickle.load(f)

    history: List[float] = []
    # deterministic batch assignment by doc order (reference processes
    # docs in lexicographic order; batches are contiguous slices) —
    # materialized as a batch_id column, no driver-side key collect
    from pyspark.sql import functions as F

    from ocular_spark.decoder import CompiledTransitionModel

    # one job: batch assignment's offsets prefix-sum also yields n_docs
    # (the round-3 code ran a separate pages_df.count() first)
    pages_b, n_batches, n_docs = assign_batches(pages_df, update_doc_batch_size)

    # compile the transition model once per (LM, GSM) generation on
    # the driver (re-broadcast ships tables, workers skip the compile).
    # tm_factory(lm, gsm) supports the code-switch / markov-offset
    # variants (DecoderEM.constructTransitionModel :134-162); the
    # default is the monolingual dense model.
    if tm_factory is None:
        # pick the factory by model type (DecoderEM.constructTransitionModel
        # :134-162 does likewise): a code-switch LM or a GSM needs the
        # code-switch transition model; CompiledTransitionModel would
        # silently drop the GSM / fail on a cslm
        from ocular_spark.lm import BasicCodeSwitchLanguageModel

        if isinstance(lm, BasicCodeSwitchLanguageModel) or gsm is not None or gsm_factory is not None:
            from ocular_spark.cstransition import CodeSwitchTransitionModel

            tm_factory = lambda _lm, _gsm: CodeSwitchTransitionModel(
                _lm, gsm=_gsm, allow_glyph_substitution=_gsm is not None
            )
        else:
            tm_factory = lambda _lm, _gsm: CompiledTransitionModel(_lm)
    tm = tm_factory(lm, gsm)
    for it in range(start_iter + 1, num_em_iters + 1):
        iter_log_prob = 0.0
        for b_idx in range(n_batches):
            bundle = ModelBundle(
                font.to_bytes(), lm, beam_size=beam_size, transition_model=tm
            )
            bundle_bc = spark.sparkContext.broadcast(bundle)
            batch_df = pages_b.filter(F.col("batch_id") == b_idx).drop("batch_id")
            counts = run_estep(
                spark, batch_df, bundle_bc, char_strs, max_order, num_partitions
            )
            iter_log_prob += counts.joint_log_prob
            font = apply_font_mstep(font, counts, char_strs)
            models_changed = False
            if reestimate_lm_too:
                from ocular_spark.lm import BasicCodeSwitchLanguageModel

                if isinstance(lm, BasicCodeSwitchLanguageModel):
                    lm = reestimate_cslm(lm, counts)
                else:
                    lm = reestimate_lm(lm, counts)
                models_changed = True
            if gsm_factory is not None and counts.gsm_counts is not None:
                # GSM M-step (BasicGlyphSubstitutionModelFactory.make
                # adds the smoothing prior to the raw Viterbi counts)
                gsm = gsm_factory.make(counts.gsm_counts)
                models_changed = True
            if models_changed:
                tm = tm_factory(lm, gsm)
            if out_dir:
                os.makedirs(out_dir, exist_ok=True)
                font.save_npz(_font_path(out_dir, it, b_idx + 1))
        avg = iter_log_prob / max(1, n_docs)
        history.append(avg)
        if out_dir:
            font.save_npz(_font_path(out_dir, it, 0) + ".final")
            with open(_lm_path(out_dir, it, 0) + ".final", "wb") as f:
                pickle.dump(lm, f)
            if gsm is not None:
                with open(_gsm_path(out_dir, it, 0) + ".final", "wb") as f:
                    pickle.dump(gsm, f)
    # the reference's trainFont returns (font, lm, gsm)
    # (train/FontTrainer.java:56-134) — dropping the trained GSM would
    # silently restart multilingual decoding from the initial one
    return font, lm, gsm, history
