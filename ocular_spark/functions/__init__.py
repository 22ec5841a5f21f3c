"""Function namespace: charset algebra, text readers, LM, eval."""

from ocular_spark.charset import CharIndexer, normalize_char, read_normalize_characters  # noqa: F401
from ocular_spark.textread import build_reader_chain, normalize_lines_fast  # noqa: F401
from ocular_spark.eval import edit_distance, get_unsegmented_eval  # noqa: F401
from ocular_spark.lm import LmPerplexity, build_ngram_lm_from_chars  # noqa: F401
