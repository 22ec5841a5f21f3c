"""Preprocessing chain tests (reference: preprocessing/*.java).

The reference's bundled doc.jpg cannot be decoded here (no image
codec in this environment), so the chain is validated on synthetic
pages rendered from the fixture font — line counts and band geometry
are checkable by construction (SURVEY.md §5.2)."""

import numpy as np
import pytest

from ocular_spark.fixtures import render_text_line
from ocular_spark.font import LINE_HEIGHT
from ocular_spark.preprocess import (
    BOT_DIST,
    TOP_DIST,
    JavaRandom,
    binarize_already_binary,
    binarize_global,
    extract_lines,
    is_binary,
    levels_to_pixels,
    prepare_page,
    resample_to_height,
    rotate_levels,
    straighten,
)


def make_page(texts, gap=14):
    """Stack 40-row bands (the extractor's TOP_DIST+BOT_DIST geometry,
    like fixtures.media_lines_to_page_pngs) with white gaps."""
    lines = [render_text_line(t) for t in texts]
    wmax = max(l.shape[0] for l in lines)
    band = TOP_DIST + BOT_DIST
    yi = np.minimum((np.arange(band) * LINE_HEIGHT) // band, LINE_HEIGHT - 1)
    cols = [np.full((wmax, gap), 255.0)]
    for l in lines:
        up = l[:, yi]
        blk = np.full((wmax, band), 255.0)
        blk[: l.shape[0]] = np.where(up == 1, 0.0, 255.0)
        cols.append(blk)
        cols.append(np.full((wmax, gap), 255.0))
    return np.concatenate(cols, axis=1)  # (width, height)


def test_java_random_matches_jdk():
    # first values of java.util.Random(0) — published LCG spec
    r = JavaRandom(0)
    assert r.next_double() == pytest.approx(0.730967787376657, abs=1e-15)
    assert r.next_double() == pytest.approx(0.24053641567148587, abs=1e-15)
    r2 = JavaRandom(0)
    assert r2.next_int(24) == 0


def test_binarize_global_percentile():
    rng = np.random.RandomState(3)
    levels = rng.randint(0, 256, size=(50, 40)).astype(np.float64)
    out = binarize_global(0.12, levels)
    assert set(np.unique(out)) <= {0.0, 255.0}
    # ~12% of pixels at/below the percentile threshold become black
    frac_black = (out == 0).mean()
    assert 0.10 <= frac_black <= 0.15


def test_binarize_already_binary_passthrough():
    levels = np.where(np.random.RandomState(0).rand(20, 20) < 0.3, 17.0, 201.0)
    assert is_binary(levels)
    out = binarize_global(0.12, levels)
    np.testing.assert_array_equal(out, binarize_already_binary(levels))
    assert set(np.unique(out)) == {0.0, 255.0}


def test_straighten_recovers_skew():
    page = make_page(["the cat sat on a mat", "a man ran to a van"])
    skewed = rotate_levels(page, 0.03)
    fixed = straighten(skewed)
    from ocular_spark.preprocess import vertical_total_variation

    assert vertical_total_variation(fixed) >= vertical_total_variation(skewed)


def test_extract_lines_counts():
    for texts in (["one line here"], ["the cat sat", "on a mat", "no rat ran"]):
        page = binarize_global(0.12, make_page(texts))
        lines = extract_lines(page, num_iters=5, num_restarts=20)
        assert len(lines) == len(texts), texts
        for l in lines:
            assert l.shape == (page.shape[0], TOP_DIST + BOT_DIST)


def test_resample_and_pixels():
    line = np.full((100, 40), 255.0)
    line[:, 10:20] = 0.0
    out = resample_to_height(line, LINE_HEIGHT)
    assert out.shape == (75, LINE_HEIGHT)
    px = levels_to_pixels(out)
    assert set(np.unique(px)) <= {0, 1}
    assert px.sum() > 0


def test_prepare_page_end_to_end():
    page = make_page(["the cat sat", "on a mat"])
    # add light noise so the page isn't already-binary
    rng = np.random.RandomState(5)
    noisy = np.clip(page + rng.randint(-40, 40, page.shape), 0, 255).astype(np.float64)
    lines = prepare_page(noisy, do_straighten=False, do_crop=False, num_em_restarts=20)
    assert len(lines) == 2
    for l in lines:
        assert l.shape[1] == LINE_HEIGHT
        assert l.dtype == np.uint8
        assert (l == 1).sum() > 0  # has black pixels


def test_crop_keeps_content_on_margin_page():
    """Cropper semantics (Cropper.java:254-273): on a page with large
    white margins, cropping keeps the content block."""
    from ocular_spark.preprocess import crop

    inner = make_page(["the cat sat on a mat", "a man ran to a van"])
    w, h = inner.shape
    page = np.full((w + 80, h + 80), 255.0)
    page[40 : 40 + w, 40 : 40 + h] = inner
    cropped = crop(page, 0.12)
    # content survives: the cropped page still contains (nearly) all
    # black ink of the original content block
    black_before = (page <= 127.5).sum()
    black_after = (cropped <= 127.5).sum()
    assert black_after >= 0.95 * black_before
    # and the crop actually removed some margin
    assert cropped.size < page.size


def test_crop_recovers_margin_page_tokens(sf_dir):
    """O4 integration (round-4 punch #7): a page wrapped in book-scan
    margins + dark edge bands (fixtures.add_page_margins) decodes to
    the pre-extracted-lines tokens ONLY with the cropper on; with crop
    off the bands reach line extraction and corrupt the decode."""
    import os

    import pyarrow.parquet as pq

    from ocular_spark.fixtures import (
        add_page_margins,
        build_models,
        derive_docs_and_media,
        media_lines_to_page_pngs,
    )
    from ocular_spark.functions.png import decode_gray_png
    from ocular_spark.pipeline import ModelBundle, get_decoder, unpack_line
    from ocular_spark.preprocess import prepare_page
    from ocular_spark.transcriptions import diplomatic_text

    documents = pq.read_table(
        os.path.join(sf_dir, "documents.parquet")
    ).to_pandas()
    docs, media = derive_docs_and_media(
        documents, n_docs=1, max_pages_per_doc=1, noise_levels=(0.0,)
    )
    pages = media_lines_to_page_pngs(media, skew=False)
    bundle, char_strs = build_models(documents)
    decoder = get_decoder(ModelBundle(bundle.font_bytes, bundle.lm, beam_size=10,
                                      transition_model=bundle.transition_model))

    r = next(media.itertuples())
    want = diplomatic_text(
        decoder.decode_document([unpack_line(raw) for raw in r.lines])[0],
        char_strs,
    ).split()

    png = add_page_margins(next(pages.itertuples()).page_png)
    page = decode_gray_png(png).T.astype(float)
    on = prepare_page(page, do_crop=True, num_em_restarts=20)
    got_on = diplomatic_text(decoder.decode_document(on)[0], char_strs).split()
    assert got_on == want, (got_on, want)

    off = prepare_page(page, do_crop=False, num_em_restarts=20)
    got_off = diplomatic_text(decoder.decode_document(off)[0], char_strs).split()
    assert got_off != want  # the dark bands corrupt the un-cropped decode


def test_add_page_margins_respects_cropper_center_bound():
    """The margin fixture must keep content >= 60% of each dimension
    (HORIZ/VERT_MIN_CENTER_SEG_RATIO): larger margins would make the
    cropper's single-column segment search reject the content segment
    and the crop driver row would decode garbage."""
    import numpy as np

    from ocular_spark.fixtures import add_page_margins
    from ocular_spark.functions.png import decode_gray_png, encode_gray_png

    rng = np.random.RandomState(3)
    for h, w in [(120, 400), (60, 900), (300, 300)]:
        img = (rng.rand(h, w) * 255).astype(np.uint8)
        out = decode_gray_png(add_page_margins(encode_gray_png(img)))
        oh, ow = out.shape
        assert h / oh >= 0.6 and w / ow >= 0.6, (h, w, oh, ow)
        # dark bands present at the rim, content centered and intact
        assert (out[:6] <= 30).all() and (out[:, :6] <= 30).all()
        mh = (oh - h) // 2
        mw = (ow - w) // 2
        np.testing.assert_array_equal(out[mh : mh + h, mw : mw + w], img)
