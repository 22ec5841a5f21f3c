"""EM font-training tests (reference: train/FontTrainer.java).

Invariants from SURVEY.md §5.2:
  * count tensors are aggregation-order-independent: the Spark
    treeAggregate result equals a sequential single-process
    accumulation;
  * avg joint log-prob is non-decreasing across EM iterations on the
    self-consistent fixture (FontTrainer prints exactly this metric);
  * the batch-complete rule matches the reference's remainder-lumping
    semantics (FontTrainer.isBatchComplete :272-285).
"""

import os

import numpy as np
import pandas as pd
import pytest

from ocular_spark.em import (
    CountsBundle,
    accumulate_lm_counts,
    accumulate_page_counts,
    apply_font_mstep,
    is_batch_complete,
    run_estep,
    train_font,
)
from ocular_spark.fixtures import build_models, render_text_line
from ocular_spark.pipeline import ModelBundle, get_decoder, pack_line


def test_is_batch_complete_reference_semantics():
    # 10 docs, batch size 4: batches complete at doc 3 (idx), remainder
    # (docs 8,9 after the batch at idx 7) lumps into the second batch
    completions = [
        is_batch_complete(10, i, cur, 4)
        for i, cur in [(0, 1), (1, 2), (2, 3), (3, 4), (4, 1), (5, 2), (6, 3), (7, 4), (8, 5), (9, 6)]
    ]
    assert completions == [False, False, False, True, False, False, False, False, False, True]
    # noUpdateIfBatchTooSmall on the last doc
    assert is_batch_complete(3, 2, 3, 4, no_update_if_batch_too_small=False)
    assert not is_batch_complete(3, 2, 3, 4, no_update_if_batch_too_small=True)


def test_assign_batches_matches_reference_loop(spark):
    """The materialized batch_id column must reproduce exactly the
    contiguous slices the round-1 collect+isin loop (and the
    reference's isBatchComplete walk) produced."""
    from ocular_spark.em import assign_batches

    for n, batch in [(10, 4), (9, 3), (3, 4), (8, 8), (7, 2), (5, 1)]:
        keys = [("doc-%03d" % i, "m-%03d" % i) for i in range(n)]
        # reference walk
        ref_batches, cur = [], []
        for i, k in enumerate(keys):
            cur.append(k)
            if is_batch_complete(n, i, len(cur), batch):
                ref_batches.append(cur)
                cur = []
        if cur:
            ref_batches.append(cur)
        want = {
            k: b_idx for b_idx, ks in enumerate(ref_batches) for k in ks
        }
        df = spark.createDataFrame(
            [(d, m, "x") for d, m in keys], "doc_id string, media_ref string, lines string"
        )
        got_df, n_b, n_docs = assign_batches(df, batch)
        got = {(r.doc_id, r.media_ref): r.batch_id for r in got_df.collect()}
        assert n_b == len(ref_batches), (n, batch)
        assert n_docs == n, (n, batch)
        assert got == want, (n, batch)


@pytest.fixture(scope="module")
def em_fixture(sf_dir):
    import os

    import pyarrow.parquet as pq

    documents = pq.read_table(os.path.join(sf_dir, "documents.parquet")).to_pandas()
    bundle, char_strs = build_models(documents)
    texts = ["the cat sat", "on a mat", "a man ran", "to the van", "no rat sat", "a tan cat"]
    pages = []
    for i, t in enumerate(texts):
        img = render_text_line(t)
        pages.append(
            {"doc_id": "d%02d" % i, "media_ref": "m%02d" % i, "lines": [pack_line(img)]}
        )
    return bundle, char_strs, pd.DataFrame(pages), texts


def test_treeaggregate_counts_match_sequential(spark, em_fixture):
    bundle, char_strs, pages, texts = em_fixture
    max_order = bundle.lm.get_max_order()
    pages_df = spark.createDataFrame(pages)
    bundle_bc = spark.sparkContext.broadcast(bundle)
    dist = run_estep(spark, pages_df, bundle_bc, char_strs, max_order, num_partitions=3)

    # sequential oracle over the same pages
    from ocular_spark.pipeline import unpack_line

    decoder = get_decoder(bundle)
    seq = CountsBundle(max_order)
    for row in pages.itertuples():
        imgs = [unpack_line(raw) for raw in row.lines]
        decodes, lp = decoder.decode_document(imgs)
        accumulate_page_counts(seq, decodes, imgs, decoder.tm.space)
        accumulate_lm_counts(seq, decodes, char_strs)
        seq.n_pages += 1
        seq.joint_log_prob += lp

    assert dist.n_pages == seq.n_pages
    assert dist.joint_log_prob == pytest.approx(seq.joint_log_prob, rel=1e-9)
    assert set(dist.emission) == set(seq.emission)
    for k in seq.emission:
        np.testing.assert_allclose(dist.emission[k], seq.emission[k], rtol=1e-12)
    assert dist.width == seq.width
    assert dist.token_tables == seq.token_tables


def test_em_improves_joint_log_prob(spark, em_fixture):
    bundle, char_strs, pages, texts = em_fixture
    from ocular_spark.font import Font
    from ocular_spark.transcriptions import diplomatic_text
    from ocular_spark.pipeline import unpack_line

    # perturb the font: shrink all template logits (washed-out glyphs)
    font = Font.from_bytes(bundle.font_bytes)
    for c in font.characters():
        t = font.get(c)
        if not t.is_space:
            t.template_weights = (t.template_weights * 0.3).astype(np.float32)
            t.prior_means = t.template_weights.copy()
            t._log_prob_cache = {}

    pages_df = spark.createDataFrame(pages)
    trained_font, trained_lm, trained_gsm, history = train_font(
        spark,
        pages_df,
        font,
        bundle.lm,
        char_strs,
        num_em_iters=2,
        beam_size=10,
        num_partitions=3,
    )
    assert len(history) == 2
    assert history[1] >= history[0] - 1e-6, history

    # decode accuracy with the trained font on a held-out rendering
    trained_bundle = ModelBundle(trained_font.to_bytes(), trained_lm, beam_size=10)
    dec = get_decoder(trained_bundle)
    img = render_text_line("the cat ran")
    decodes, _ = dec.decode_document([img])
    assert diplomatic_text(decodes, char_strs).strip() == "the cat ran"


def test_checkpoint_resume(spark, em_fixture, tmp_path):
    bundle, char_strs, pages, texts = em_fixture
    from ocular_spark.font import Font

    font = Font.from_bytes(bundle.font_bytes)
    pages_df = spark.createDataFrame(pages.head(2))
    out_dir = str(tmp_path / "ckpt")
    f1, lm1, _g1, h1 = train_font(
        spark, pages_df, font, bundle.lm, char_strs,
        num_em_iters=1, out_dir=out_dir, num_partitions=2,
    )
    # resume skips the completed iteration entirely
    f2, lm2, _g2, h2 = train_font(
        spark, pages_df, Font.from_bytes(bundle.font_bytes), bundle.lm, char_strs,
        num_em_iters=1, out_dir=out_dir, num_partitions=2,
        continue_from_last_complete_iteration=True,
    )
    assert h2 == []  # nothing re-run
    a = f1.get("a").template_weights
    b = f2.get("a").template_weights
    np.testing.assert_array_equal(a, b)


def test_estep_accumulates_gsm_counts(spark, em_fixture):
    """A6 integration: the distributed E-step carries GSM (lang,
    lmChar, glyph) counts; a GSM built from them row-normalizes
    (gsm/BasicGlyphSubstitutionModel.make :263-283)."""
    from ocular_spark.gsm import BasicGlyphSubstitutionModelFactory

    bundle, char_strs, pages, texts = em_fixture
    max_order = bundle.lm.get_max_order()
    pages_df = spark.createDataFrame(pages)
    bundle_bc = spark.sparkContext.broadcast(bundle)
    counts = run_estep(spark, pages_df, bundle_bc, char_strs, max_order, num_partitions=2)
    # monolingual decode: langs are -1 => no GSM counts accrue (the
    # reference only counts when a language is assigned)
    assert counts.gsm_counts is None or counts.gsm_counts.sum() == 0


def test_gsm_counts_from_code_switch_decode():
    import numpy as np

    from ocular_spark.cstransition import CodeSwitchTransitionModel
    from ocular_spark.decoder import Decoder
    from ocular_spark.em import CountsBundle, accumulate_gsm_counts
    from ocular_spark.fixtures import render_text_line
    from ocular_spark.glyphs import build_init_font
    from ocular_spark.gsm import BasicGlyphSubstitutionModelFactory, NoSubGlyphSubstitutionModel
    from ocular_spark.charset import CharIndexer
    from ocular_spark.lm import (
        KNESER_NEY,
        BasicCodeSwitchLanguageModel,
        CorpusCounter,
        NgramLanguageModel,
        add_auxiliary_glyph_chars,
    )

    ci = CharIndexer()
    counter = CorpusCounter(3)
    corpus = ["the cat sat on the mat", "a fast cat", "-"] * 5
    for i, line in enumerate(corpus):
        counter.count_line_chars(list(line), ci, i)
    active = set(counter.active_characters) | {ci.get_index(" ")}
    add_auxiliary_glyph_chars(ci)
    ci.lock()
    lm = NgramLanguageModel(ci, counter.counts, active, KNESER_NEY, 1.0)
    cslm = BasicCodeSwitchLanguageModel([(lm, 1.0)], ci, ["english"], 0.999999)
    font = build_init_font(ci.get_objects())
    tm = CodeSwitchTransitionModel(cslm, True, NoSubGlyphSubstitutionModel(ci), False)
    dec = Decoder(font, cslm, beam_size=10, transition_model=tm)
    img = render_text_line("the cat sat")
    decodes, _ = dec.decode_document([img])
    bundle = CountsBundle(3)
    accumulate_gsm_counts(bundle, decodes, ci.get_objects(), 1)
    assert bundle.gsm_counts is not None
    assert bundle.gsm_counts.sum() >= len("thecatsat")  # one per TMPL char
    # identity glyphs dominate (no substitution model active)
    a = ci.get_index("a")
    assert bundle.gsm_counts[0, a, a] >= 2
    # and the factory turns raw counts + smoothing into a normalized GSM
    f = BasicGlyphSubstitutionModelFactory(
        0.1, 100.0, ["english"], ci, [lm.get_active_characters()], 1.0
    )
    gsm = f.make(f.initialize_new_counts_matrix() + bundle.gsm_counts)
    sums = gsm.probs[0].sum(axis=1)
    assert abs(sums[a] - 1.0) < 1e-9


def test_separate_runs_by_language():
    from ocular_spark.em import separate_runs_by_language

    running = list("the cat")
    langs = [0] * 3 + [0] + [1] * 3  # "the " english, "cat" reversed
    runs = separate_runs_by_language(running, langs, 2)
    assert runs == {0: [list("the ")], 1: [list("cat")]}
    # -1 maps to 0 only in the monolingual case
    assert separate_runs_by_language(list("ab"), [-1, -1], 1) == {0: [list("ab")]}
    assert separate_runs_by_language(list("ab"), [-1, -1], 2) == {}
    # duplicate spaces collapse within a run
    runs = separate_runs_by_language(list("a  b"), [0, 0, 0, 0], 1)
    assert runs == {0: [list("a b")]}


def test_multilingual_em_reestimates_per_language_lms(spark, sf_dir, tmp_path):
    """EM-with-GSM e2e on the code-switch model: per-language KN
    rebuild + 0.5 interpolation + priors proportional to decoded
    chars + 1 (FontTrainer.reestimateLM :340-424), GSM refit from
    distributed Viterbi counts, non-decreasing joint log prob."""
    import pyarrow.parquet as pq

    from ocular_spark.cstransition import CodeSwitchTransitionModel
    from ocular_spark.em import train_font
    from ocular_spark.fixtures import build_models_cs, reverse_words
    from ocular_spark.font import Font
    from ocular_spark.gsm import BasicGlyphSubstitutionModelFactory
    from ocular_spark.lm import InterpolatingSingleLanguageModel

    documents = pq.read_table(os.path.join(sf_dir, "documents.parquet")).to_pandas()
    bundle, char_strs = build_models_cs(documents)
    cslm = bundle.lm
    ci = cslm.get_character_indexer()
    actives = [cslm.get(k).get_active_characters() for k in range(2)]
    gsm_factory = BasicGlyphSubstitutionModelFactory(
        1.0, 100.0, list(cslm.lang_names), ci, actives, gsm_power=1.0
    )

    texts = [str(t) for t in documents["text"].head(4)]
    pages = []
    for i, t in enumerate(texts):
        words = t.split()[:3]
        line = " ".join(words) if i % 2 == 0 else reverse_words(" ".join(words))
        pages.append(
            {"doc_id": "ml%02d" % i, "media_ref": "mm%02d" % i,
             "lines": [pack_line(render_text_line(line))]}
        )
    pages_df = spark.createDataFrame(pd.DataFrame(pages))

    def tm_factory(lm, gsm):
        return CodeSwitchTransitionModel(
            lm, True, gsm, allow_glyph_substitution=True, no_char_sub_prior=0.9
        )

    font = Font.from_bytes(bundle.font_bytes)
    trained_font, trained_lm, trained_gsm, history = train_font(
        spark, pages_df, font, cslm, char_strs,
        num_em_iters=2, beam_size=20,
        reestimate_lm_too=True,
        tm_factory=tm_factory,
        gsm_factory=gsm_factory,
        gsm=gsm_factory.uniform(),
    )
    assert len(history) == 2
    assert history[1] >= history[0]  # hard EM improves the joint
    # both languages decoded -> both submodels interpolated
    assert isinstance(trained_lm.get(0), InterpolatingSingleLanguageModel)
    assert isinstance(trained_lm.get(1), InterpolatingSingleLanguageModel)
    # priors proportional to decoded chars + 1 — both languages seen,
    # so both priors strictly inside (0, 1) and different from init
    p0, p1 = trained_lm.language_priors
    assert 0.0 < p0 < 1.0 and 0.0 < p1 < 1.0
    assert abs(p0 - 0.6) > 1e-6 or abs(p1 - 0.4) > 1e-6
    # the trained GSM must be returned (not silently dropped): it was
    # re-estimated from Viterbi counts, so it differs from the uniform
    # initialization (ADVICE r2: trainFont returns the gsm too)
    assert trained_gsm is not None
