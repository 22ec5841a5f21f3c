"""spark-submit entry point: initialize LM / font / GSM artifacts.

    python ocular_spark/jobs/initialize_models.py \
        --corpus /path/documents.parquet [--text-col text] [--order 3] \
        --models-out /path/models.pkl [--gsm-out /path/gsm.pkl] \
        [--max-docs 100] [--lm-power 1.0]

Covers the reference's three initializers in one job (the artifacts
feed jobs/train_font.py and jobs/transcribe.py):
  * InitializeLanguageModel.java — char n-gram LM from a text corpus
    (hyphen forced into the charset, :272-274);
  * InitializeFont.java — templates initialized per charset character
    (procedural glyph renderer replaces AWT font rasterization);
  * InitializeGlyphSubstitutionModel.java — uniform GSM factory model
    over the LM's active characters (optional, --gsm-out).

Raises on an empty corpus (NoDocumentsFoundException semantics,
main/NoDocumentsFoundException.java — the F3 fail-if-empty contract).
Driver-side only: model initialization is small; Spark jobs consume
the artifacts.
"""

from __future__ import annotations

import argparse
import os
import pickle
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))))


class NoDocumentsFoundError(RuntimeError):
    """main/NoDocumentsFoundException.java"""


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--corpus", required=True, help="parquet with a text column")
    ap.add_argument("--text-col", default="text")
    ap.add_argument("--order", type=int, default=3)
    ap.add_argument("--lm-power", type=float, default=1.0)
    ap.add_argument("--max-docs", type=int, default=100)
    ap.add_argument("--models-out", required=True)
    ap.add_argument("--gsm-out", default=None)
    args = ap.parse_args()

    import pyarrow.parquet as pq

    from ocular_spark.charset import SPACE, CharIndexer
    from ocular_spark.glyphs import build_init_font
    from ocular_spark.lm import (
        KNESER_NEY,
        CorpusCounter,
        NgramLanguageModel,
        add_auxiliary_glyph_chars,
    )

    table = pq.read_table(args.corpus, columns=[args.text_col])
    texts = [str(t) for t in table[args.text_col].to_pylist()[: args.max_docs] if str(t)]
    if not texts:
        raise NoDocumentsFoundError(
            "no non-empty documents in %s" % args.corpus
        )

    ci = CharIndexer()
    corpus = [list(t) for t in texts]
    corpus.append(list("-"))  # InitializeLanguageModel.java:272-274
    counter = CorpusCounter(max(args.order, 2))
    for i, chars in enumerate(corpus):
        counter.count_line_chars(chars, ci, i)
    active = set(counter.active_characters) | {ci.get_index(SPACE)}
    if args.gsm_out:
        # glyph-substitution charset (long-s, ligatures, tilde
        # variants of the chars just counted) must enter the indexer
        # before it locks (InitializeLanguageModel.java:287-307)
        add_auxiliary_glyph_chars(ci)
    ci.lock()
    lm = NgramLanguageModel(ci, counter.counts, active, KNESER_NEY, args.lm_power)
    font = build_init_font(ci.get_objects())

    os.makedirs(os.path.dirname(os.path.abspath(args.models_out)), exist_ok=True)
    with open(args.models_out, "wb") as f:
        pickle.dump((font.to_bytes(), lm), f)
    print(
        "initialized lm (order=%d, %d chars) + font -> %s"
        % (args.order, ci.size(), args.models_out)
    )

    if args.gsm_out:
        from ocular_spark.gsm import BasicGlyphSubstitutionModelFactory

        factory = BasicGlyphSubstitutionModelFactory(
            1.0, 100.0, ["language0"], ci, [lm.get_active_characters()], gsm_power=1.0
        )
        with open(args.gsm_out, "wb") as f:
            pickle.dump((factory, factory.uniform()), f)
        print("initialized uniform GSM -> %s" % args.gsm_out)


if __name__ == "__main__":
    main()
