"""Font / CharacterTemplate math tests (reference: model/CharacterTemplate.java).

The reference ships no unit tests for this file; these tests assert
the documented math directly: interpolation-weight structure
(:107-126), logistic log-probs (:416-435), width gaussians (:344-371),
offset clipping (:241-245), LBFGS init convergence (:138-155).
"""

import numpy as np
import pytest

from ocular_spark.font import (
    BLACK,
    EXP_GAINS,
    EXP_SPC_BLACK_PROBS,
    LINE_HEIGHT,
    OBSCURED,
    WHITE,
    CharacterTemplate,
    Font,
    build_gaussian_width_probs,
)
from ocular_spark.glyphs import build_init_font, glyph_variants, render_glyph


def test_interpolation_weights_structure():
    t = CharacterTemplate("a", 1.0, 0.0)
    assert t.max_width == 30 and t.min_width == 1
    for e in range(3):
        for w in (0, 10, 29):
            width = t.min_width + w
            iw = t.interpolation_weights[e][w]
            assert iw.shape == (width, 30)
            # rows normalized then scaled by the exposure gain
            np.testing.assert_allclose(iw.sum(axis=1), EXP_GAINS[e], rtol=1e-5)
    # full width, exposure 0: weights peak on the diagonal
    iw = t.interpolation_weights[0][29]
    assert (iw.argmax(axis=1) == np.arange(30)).all()


def test_space_template_probs():
    t = CharacterTemplate(" ", 1.0, 0.0)
    for e in range(3):
        lb = t.log_black_probs(e, 0, 5)
        lw = t.log_white_probs(e, 0, 5)
        np.testing.assert_allclose(lb, np.log(EXP_SPC_BLACK_PROBS[e]), rtol=1e-6)
        np.testing.assert_allclose(lw, np.log(1 - EXP_SPC_BLACK_PROBS[e]), rtol=1e-6)


def test_logistic_log_probs():
    t = CharacterTemplate("a", 1.0, 0.0)
    t.template_weights[:, :] = 2.0  # all-logit-2 template
    t._log_prob_cache = {}
    width = 30
    lb = t.log_black_probs(0, 0, width)
    lw = t.log_white_probs(0, 0, width)
    # exposure 0 gain is 1.0 so inner = 2.0 everywhere
    expect_b = 2.0 - np.log1p(np.exp(2.0))
    expect_w = -np.log1p(np.exp(2.0))
    np.testing.assert_allclose(lb, expect_b, rtol=1e-5)
    np.testing.assert_allclose(lw, expect_w, rtol=1e-5)
    # exposure 1 halves the gain
    lb1 = t.log_black_probs(1, 0, width)
    np.testing.assert_allclose(lb1, 1.0 - np.log1p(np.exp(1.0)), rtol=1e-5)
    # black + white probs sum to 1
    np.testing.assert_allclose(np.exp(lb) + np.exp(lw), 1.0, rtol=1e-6)


def test_offset_clipping():
    t = CharacterTemplate("a", 1.0, 0.0)
    t.template_weights[:, 0] = 3.0
    t.template_weights[:, 29] = -3.0
    t._log_prob_cache = {}
    lb0 = t.log_black_probs(0, 0, 5)
    lb_neg = t.log_black_probs(0, -2, 5)
    # offset -2: observation row j reads template row max(0, j-2);
    # rows 0..2 all read template row 0
    np.testing.assert_allclose(lb_neg[:, 0], lb0[:, 0])
    np.testing.assert_allclose(lb_neg[:, 2], lb0[:, 0])
    lb_pos = t.log_black_probs(0, 2, 5)
    np.testing.assert_allclose(lb_pos[:, 29], lb0[:, 29])
    np.testing.assert_allclose(lb_pos[:, 27], lb0[:, 29])


def test_emission_log_prob_and_obscured():
    t = CharacterTemplate("a", 1.0, 0.0)
    rng = np.random.RandomState(0)
    t.template_weights = rng.randn(30, LINE_HEIGHT).astype(np.float32)
    t._log_prob_cache = {}
    obs = rng.randint(0, 2, size=(10, LINE_HEIGHT)).astype(np.uint8)
    lp = t.emission_log_prob(obs, 0, 10, 0, 0)
    lb = t.log_black_probs(0, 0, 10)
    lw = t.log_white_probs(0, 0, 10)
    expect = np.where(obs == BLACK, lb, lw).sum()
    assert lp == pytest.approx(float(expect), rel=1e-6)
    # OBSCURED pixels contribute exactly 0
    obs2 = obs.copy()
    obs2[:, 5] = OBSCURED
    lp2 = t.emission_log_prob(obs2, 0, 10, 0, 0)
    expect2 = np.where(obs2 == BLACK, lb, np.where(obs2 == WHITE, lw, 0.0)).sum()
    assert lp2 == pytest.approx(float(expect2), rel=1e-6)


def test_gaussian_width_probs():
    p = build_gaussian_width_probs(10.0, 4.0, 1, 30, 2.5)
    assert p.sum() == pytest.approx(1.0, rel=1e-6)
    # threshold: |w - 10| >= 2.5*2 = 5 → zero
    assert p[15 - 1] == 0.0  # width 15 is 5 away
    assert p[10 - 1] == p.max()
    assert p[9 - 1] == pytest.approx(p[11 - 1], rel=1e-5)


def test_width_refit_from_counts():
    t = CharacterTemplate("a", 1.0, 0.0)
    t.increment_width_counts(8, 2.0)
    t.increment_width_counts(10, 6.0)
    t.increment_width_counts(12, 2.0)
    t.update_width_parameters()
    widths = t.allowed_widths()
    assert 10 in widths
    best = max(widths, key=t.width_prob)
    assert best == 10
    assert 30 not in widths  # far from mean → thresholded to 0


def test_init_from_font_data_recovers_glyph():
    """LBFGS init: template black probs must be high exactly where the
    glyph is black (CharacterTemplate.java:138-155 semantics)."""
    variants = glyph_variants("o")
    t = CharacterTemplate("o", 1.0, 0.0)
    t.initialize_and_set_prior_from_font_data(variants)
    # prior == learned weights after init
    np.testing.assert_array_equal(t.prior_means, t.template_weights)
    # render at the most likely width: black probs correlate with glyph
    w = max(t.allowed_widths(), key=t.width_prob)
    glyph = render_glyph("o", target_width=w)
    bp = t.black_probs(0, 0, w)
    black_mean = bp[glyph == BLACK].mean()
    white_mean = bp[glyph == WHITE].mean()
    assert black_mean > 0.6
    assert white_mean < 0.25
    assert black_mean - white_mean > 0.5


def test_font_roundtrip():
    font = build_init_font(["a", "b", " "])
    raw = font.to_bytes()
    font2 = Font.from_bytes(raw)
    assert set(font2.characters()) == {"a", "b", " "}
    ta, tb = font.get("a"), font2.get("a")
    np.testing.assert_array_equal(ta.template_weights, tb.template_weights)
    np.testing.assert_array_equal(ta.width_probs, tb.width_probs)
    w = max(ta.allowed_widths(), key=ta.width_prob)
    np.testing.assert_allclose(
        ta.log_black_probs(1, 2, w), tb.log_black_probs(1, 2, w), rtol=1e-6
    )


def test_glyphs_deterministic_and_distinct():
    a1 = glyph_variants("a")
    a2 = glyph_variants("a")
    for x, y in zip(a1, a2):
        np.testing.assert_array_equal(x, y)
    b = glyph_variants("b")
    assert any((x != y).any() for x, y in zip(a1, b))
    # unknown char falls back to a deterministic hash glyph
    q1 = render_glyph("ß")
    q2 = render_glyph("ß")
    np.testing.assert_array_equal(q1, q2)
    assert (q1 == BLACK).any()
