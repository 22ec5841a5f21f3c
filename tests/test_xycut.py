"""XY-cut reading-order properties (ocular_spark/functions/layout.py).

The driver row (layout_reading_order) pins kernel == independent
recursive reference over the sf0.01 fixture via the frozen golden;
these tests pin the LAWS the spec promises on constructed pages, plus
permutation/partitioning invariance of the Spark path.
"""

import numpy as np
import pytest

from ocular_spark.functions.layout import (
    MIN_GAP,
    reading_order_kernel,
    READING_ORDER_SCHEMA,
    synth_page_blocks,
    xy_cut_order,
)


def _order(blocks):
    return list(xy_cut_order(np.asarray(blocks, dtype=np.int64)))


def test_single_column_is_y_order():
    blocks = [(50, 300, 950, 380), (50, 40, 950, 120), (50, 170, 950, 270)]
    assert _order(blocks) == [1, 2, 0]


def test_two_columns_read_left_column_fully_first():
    # left column blocks interleave with right column in y; reading
    # order must still be ALL left before ALL right (a plain y-sort
    # would interleave 0,2,1,3)
    left = [(50, 40, 488, 140), (50, 160, 488, 260)]
    right = [(512, 90, 950, 190), (512, 210, 950, 310)]
    assert _order(left + right) == [0, 1, 2, 3]
    assert _order(right + left) == [2, 3, 0, 1]


def test_full_width_header_cuts_before_columns():
    header = [(50, 40, 950, 140)]
    left = [(50, 170, 488, 270)]
    right = [(512, 170, 950, 270)]
    # header first (horizontal cut), then left column, then right
    assert _order(right + header + left) == [1, 2, 0]


def test_tight_grid_falls_back_to_scan_order():
    # gaps < MIN_GAP on both axes -> leaf sorted by (y0, x0)
    g = [(306, 130, 506, 220), (100, 130, 300, 220),
         (306, 32, 506, 122), (100, 32, 300, 122)]
    assert _order(g) == [3, 2, 1, 0]


def test_min_gap_boundary_inclusive():
    """A gap of exactly MIN_GAP qualifies; MIN_GAP-1 does not.

    Two columns whose right column is shifted UP so the y projection
    has no gap: with a qualifying x gutter the order is column-major
    (TL, BL, TR, BR); without one the page is a leaf and (y0, x0)
    scan order starts with the higher-up TR."""
    def page(gutter):
        tl = (50, 40, 250, 140)
        bl = (50, 150, 250, 250)
        tr = (250 + gutter, 30, 450 + gutter, 130)
        br = (250 + gutter, 140, 450 + gutter, 240)
        return [tl, tr, bl, br]

    assert _order(page(MIN_GAP)) == [0, 2, 1, 3]      # cut: columns
    assert _order(page(MIN_GAP - 1)) == [1, 0, 3, 2]  # leaf: scan


def test_cross_axis_tie_prefers_horizontal_cut():
    # 2x2 arrangement with IDENTICAL x and y gap widths (= 20):
    # y-cut wins ties -> top row fully before bottom row
    g = [(50, 40, 250, 140), (270, 40, 470, 140),
         (50, 160, 250, 260), (270, 160, 470, 260)]
    # after the y cut, each row splits left/right -> row-major
    assert _order(g) == [0, 1, 2, 3]
    # make the x gap strictly wider (30 > 20): vertical cut wins ->
    # column-major
    g2 = [(50, 40, 250, 140), (280, 40, 480, 140),
          (50, 160, 250, 260), (280, 160, 480, 260)]
    assert _order(g2) == [0, 2, 1, 3]


def test_input_permutation_invariance():
    # reading order of COORDINATES is independent of input row order
    rng = np.random.RandomState(7)
    for did in (0, 1, 2, 3, 17, 42):
        blocks = np.asarray(synth_page_blocks(did), dtype=np.int64)
        base = blocks[xy_cut_order(blocks)]
        for _ in range(3):
            perm = rng.permutation(len(blocks))
            shuffled = blocks[perm]
            got = shuffled[xy_cut_order(shuffled)]
            assert np.array_equal(got, base)


def test_synth_classes_nontrivial_and_kernel_deterministic():
    nontrivial = 0
    for did in range(40):
        blocks = np.asarray(synth_page_blocks(did), dtype=np.int64)
        o1, o2 = xy_cut_order(blocks), xy_cut_order(blocks)
        assert np.array_equal(o1, o2)
        if list(o1) != list(range(len(blocks))):
            nontrivial += 1
    assert nontrivial >= 35  # Fisher-Yates relabeling keeps the gate honest


@pytest.mark.usefixtures("spark")
def test_spark_path_partitioning_invariant(spark):
    """mapInPandas result is identical at 1 and 7 partitions and
    matches the serial kernel row-for-row."""
    import pandas as pd

    doc_ids = list(range(24))
    expected = []
    for did in doc_ids:
        blocks = np.asarray(synth_page_blocks(did), dtype=np.int64)
        for rank, bid in enumerate(xy_cut_order(blocks)):
            expected.append(
                (did, int(bid), rank, *[int(v) for v in blocks[bid]])
            )
    for nparts in (1, 7):
        df = (
            spark.createDataFrame(
                pd.DataFrame({"doc_id": doc_ids}), "doc_id long"
            )
            .repartition(nparts)
            .mapInPandas(reading_order_kernel(), schema=READING_ORDER_SCHEMA)
        )
        got = sorted(tuple(r) for r in df.collect())
        assert got == sorted(expected)


def test_xycut_composes_with_real_line_extractor():
    """North-rule glue: reading order over REAL extractor output — two
    rendered text columns are laid side by side with a 60px gutter
    (the right column shifted down 20px so a naive y-sort would
    interleave the columns), the reference line extractor (binarize +
    VerticalProfile EM + retrieve_baselines) runs per column region,
    and XY-cut over the resulting line boxes must read the left
    column fully before the right."""
    from ocular_spark.fixtures import render_text_line
    from ocular_spark.preprocess import (
        BOT_DIST,
        TOP_DIST,
        binarize_global,
        VerticalProfile,
        retrieve_baselines,
    )

    def column_levels(texts, shift=0):
        band = TOP_DIST + BOT_DIST
        gap = 14
        lines = [render_text_line(t) for t in texts]
        wmax = max(l.shape[0] for l in lines) + 8
        cols = [np.full((wmax, gap + shift), 255.0)]
        for l in lines:
            yi = np.minimum((np.arange(band) * 30) // band, 29)
            up = l[:, yi]
            blk = np.full((wmax, band), 255.0)
            blk[4 : 4 + l.shape[0]] = np.where(up == 1, 0.0, 255.0)
            cols.append(blk)
            cols.append(np.full((wmax, gap), 255.0))
        return np.concatenate(cols, axis=1)  # (width, height)

    left = column_levels(["the quick", "brown fox", "jumps over", "the lazy"])
    right = column_levels(["hello", "world", "again"], shift=20)
    h = max(left.shape[1], right.shape[1])

    def pad(a):
        out = np.full((a.shape[0], h), 255.0)
        out[:, : a.shape[1]] = a
        return out

    left, right = pad(left), pad(right)
    gutter = np.full((60, h), 255.0)
    page = np.concatenate([left, gutter, right], axis=0)

    def baselines(region):
        lv = binarize_global(0.12, region.astype(np.float64))
        profile = VerticalProfile(lv)
        segs = profile.decode(profile.run_em(5, 100))
        return retrieve_baselines(segs, region.shape[1])

    w1 = left.shape[0]
    boxes, labels = [], []
    lb = baselines(page[:w1])
    rb = baselines(page[w1 + 60 :])
    assert len(lb) == 4 and len(rb) == 3, (len(lb), len(rb))
    for i, b in enumerate(lb):
        boxes.append((0, b - TOP_DIST, w1, b + BOT_DIST))
        labels.append(("L", i))
    for i, b in enumerate(rb):
        boxes.append((w1 + 60, b - TOP_DIST, page.shape[0], b + BOT_DIST))
        labels.append(("R", i))
    order = [labels[k] for k in xy_cut_order(np.asarray(boxes, dtype=np.int64))]
    assert order == [("L", 0), ("L", 1), ("L", 2), ("L", 3),
                     ("R", 0), ("R", 1), ("R", 2)]
    # the shift makes naive y-sort WRONG (columns interleave in y)
    ysort = [labels[k] for k in np.argsort([b[1] for b in boxes], kind="stable")]
    assert ysort != order
