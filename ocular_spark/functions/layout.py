"""Page-layout analysis: recursive XY-cut reading order.

The north-rule extraction pipeline covers "PDF/layout parse" next to
the HTML boilerplate strip: given the text-block bounding boxes of a
page (from a PDF text layer, the line extractor, or an OCR pass), emit
the blocks in READING ORDER — multi-column pages read column-by-column,
full-width headers/figures act as horizontal separators, and
tightly-packed grids fall back to top-left scan order.

Algorithm: recursive XY-cut (Nagy & Seth 1984, "Hierarchical
representation of optically scanned documents"; the classic top-down
page segmentation used by every layout system since).  Public
knowledge; no reference-repo counterpart (the reference's layout model
is the per-LINE vertical profile in preprocess/VerticalProfile — this
operator is the page-level companion a real extraction pipeline needs
above it).

Deterministic spec (both implementations — the NumPy kernel here and
the independent recursive reference in tools/freeze_goldens.py — pin
exactly this):

* A region is a set of blocks.  Project the blocks onto each axis and
  find *gaps*: maximal empty intervals between the running max of
  interval ends and the next interval start (after sorting by start),
  of size >= MIN_GAP.
* Cut the region at the single WIDEST gap across both axes; on a
  cross-axis tie the y-axis (horizontal cut) wins; on a same-axis tie
  the topmost/leftmost gap wins.  A horizontal cut emits the top
  region first, a vertical cut the left region first.
* A region with no qualifying gap on either axis is a leaf: its blocks
  are emitted sorted by (y0, x0, y1, x1, block_id).

Everything is integer arithmetic — no floats anywhere — so the order
is bit-reproducible across engines, partitionings and retries.

Scale: the driver query synthesizes one page per document row and runs
the kernel via ``mapInPandas`` — ZERO shuffles; each Arrow batch of
doc rows expands to block rows inside the task.  On a real corpus the
input is (doc_id, page, blocks:array<struct<x0,y0,x1,y1>>) — still one
row per page, still shuffle-free; per-page work is O(n^2 log n) in the
page's block count (bounded, ~10-100), independent of corpus size.
"""

from __future__ import annotations

from typing import Iterator, List, Tuple

import numpy as np

MIN_GAP = 10  # gaps >= MIN_GAP qualify as cut candidates

PAGE_W = 1000
PAGE_H = 1400


# ------------------------------------------------- page synthesis
# Deterministic multi-class page layouts keyed on doc_id — shared by
# the Spark kernel, the frozen-golden reference and the tests (only
# the ORDERING algorithm has two independent implementations; the
# fixture is deliberately shared, like fixtures.py for the OCR rows).
# Jitter is pure integer arithmetic on doc_id so any engine replays
# it; it perturbs block extents WITHOUT closing a qualifying gap or
# opening a new one (column gutters 24 > intra-column y gaps <= 22;
# grid gaps stay <= 8 < MIN_GAP).


def _j(doc_id: int, i: int, m: int) -> int:
    """Deterministic jitter in [0, m): integer LCG on (doc_id, i)."""
    return ((doc_id * 1009 + i * 9176 + 17) * 2654435761 % (2**31)) % m


def _stack(doc_id, x0, x1, y, n, base_h, gap, salt):
    """n blocks stacked vertically from y; returns (boxes, next_y)."""
    out = []
    for i in range(n):
        h = base_h + _j(doc_id, salt + 2 * i, 5)  # heights jittered
        out.append((x0, y, x1, y + h))
        y = y + h + gap + _j(doc_id, salt + 2 * i + 1, 5)  # gaps 18..22
    return out, y


def synth_page_blocks(doc_id: int) -> List[Tuple[int, int, int, int]]:
    """Deterministic block boxes (x0, y0, x1, y1) for one page.

    Four layout classes by doc_id % 4:
      0: single column (6 stacked blocks)
      1: full-width header + two columns (4 + 3 blocks)
      2: header + two columns (3 + 3) + full-width footer
      3: two-column top region, full-width figure, then a 2x2
         tightly-packed grid (gaps < MIN_GAP -> leaf scan order)
    """
    cls = doc_id % 4
    L, R = 50, 950  # text body margins
    CL1, CR0 = 488, 512  # column gutter (width 24)
    blocks: List[Tuple[int, int, int, int]] = []
    if cls == 0:
        b, _ = _stack(doc_id, L, R, 40, 6, 80, 18, salt=0)
        blocks += b
    elif cls == 1:
        blocks.append((L, 40, R, 140 + _j(doc_id, 90, 5)))  # header
        top = 140 + 5 + 18  # past the worst-case header bottom + gap
        bl, _ = _stack(doc_id, L, CL1, top, 4, 90, 18, salt=10)
        br, _ = _stack(doc_id, CR0, R, top, 3, 120, 18, salt=20)
        blocks += bl + br
    elif cls == 2:
        blocks.append((L, 40, R, 130 + _j(doc_id, 91, 5)))  # header
        top = 130 + 5 + 18
        bl, _ = _stack(doc_id, L, CL1, top, 3, 100, 18, salt=30)
        br, _ = _stack(doc_id, CR0, R, top, 3, 110, 18, salt=40)
        blocks += bl + br
        blocks.append((L, 1250, R, 1330))  # footer (clear 30+ gap)
    else:
        bl, _ = _stack(doc_id, L, CL1, 40, 2, 100, 18, salt=50)
        br, _ = _stack(doc_id, CR0, R, 40, 2, 110, 18, salt=60)
        blocks += bl + br
        blocks.append((L, 540, R, 700))  # full-width figure
        # 2x2 grid, gaps 6/8 < MIN_GAP on both axes -> leaf
        gy = 730
        for r in range(2):
            for c in range(2):
                gx = 100 + c * 206  # 200 wide + 6 gap
                blocks.append((gx, gy, gx + 200, gy + 90))
            gy += 98  # 90 high + 8 gap
    # deterministic Fisher-Yates so block_id order != reading order —
    # otherwise every rank would be the identity and the driver gate
    # could be passed by a no-op (the permutation only relabels; the
    # geometry, and thus the reading order of COORDINATES, is fixed)
    n = len(blocks)
    for i in range(n - 1, 0, -1):
        k = _j(doc_id, 70 + i, i + 1)
        blocks[i], blocks[k] = blocks[k], blocks[i]
    return blocks


# ------------------------------------------------- XY-cut (kernel)


def _axis_gaps(starts: np.ndarray, ends: np.ndarray):
    """Qualifying gaps on one axis: (width, position) of each maximal
    empty interval >= MIN_GAP between sorted interval coverage."""
    order = np.argsort(starts, kind="stable")
    s, e = starts[order], ends[order]
    run_max = np.maximum.accumulate(e)
    # gap precedes interval i (i >= 1): s[i] - run_max[i-1]
    widths = s[1:] - run_max[:-1]
    ok = widths >= MIN_GAP
    return widths[ok], run_max[:-1][ok]


def xy_cut_order(boxes: np.ndarray) -> np.ndarray:
    """Reading-order permutation of boxes (n, 4) int array
    [x0, y0, x1, y1].  Iterative (explicit stack) NumPy form of the
    spec above; the frozen-golden reference implements the same spec
    recursively with plain Python lists."""
    boxes = np.asarray(boxes, dtype=np.int64)
    n = boxes.shape[0]
    out: List[int] = []
    stack: List[np.ndarray] = [np.arange(n)]
    while stack:
        idx = stack.pop()
        if idx.size <= 1:
            out.extend(idx.tolist())
            continue
        x0, y0, x1, y1 = (boxes[idx, k] for k in range(4))
        yw, yp = _axis_gaps(y0, y1)
        xw, xp = _axis_gaps(x0, x1)

        # same-axis tie -> topmost gap: first index where width==max
        # (positions ascend with sorted starts, so first hit is topmost)
        def pick(w, p):
            m = w.max()
            return int(m), int(p[np.flatnonzero(w == m)[0]])

        cy = pick(yw, yp) if yw.size else None
        cx = pick(xw, xp) if xw.size else None
        if cy is None and cx is None:
            # leaf: (y0, x0, y1, x1, block_id) scan order
            key = np.lexsort((idx, x1, y1, x0, y0))
            out.extend(idx[key].tolist())
            continue
        # cross-axis tie -> y wins
        use_y = cx is None or (cy is not None and cy[0] >= cx[0])
        if use_y:
            m, pos = cy
            first = idx[y1 <= pos]  # top region (ends at/before gap)
            second = idx[y1 > pos]
        else:
            m, pos = cx
            first = idx[x1 <= pos]  # left region
            second = idx[x1 > pos]
        stack.append(second)  # LIFO: first region processed first
        stack.append(first)
    return np.asarray(out, dtype=np.int64)


# ------------------------------------------------- Spark kernel


def reading_order_kernel(id_col: str = "doc_id"):
    """mapInPandas kernel: rows (doc_id) -> (doc_id, block_id, rank,
    x0, y0, x1, y1) — synthesizes the page's blocks and emits them in
    XY-cut reading order.  Arrow-batched; per-page NumPy recursion
    only (no per-row Python UDF pickling)."""
    import pandas as pd

    def fn(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in batches:
            did_out, bid, rank, coords = [], [], [], []
            for did in pdf[id_col]:
                did = int(did)
                blocks = np.asarray(synth_page_blocks(did), dtype=np.int64)
                order = xy_cut_order(blocks)
                k = order.size
                did_out.extend([did] * k)
                bid.extend(order.tolist())
                rank.extend(range(k))
                coords.append(blocks[order])
            allc = (
                np.concatenate(coords)
                if coords
                else np.zeros((0, 4), dtype=np.int64)
            )
            yield pd.DataFrame(
                {
                    id_col: did_out,
                    "block_id": bid,
                    "rank": rank,
                    "x0": allc[:, 0],
                    "y0": allc[:, 1],
                    "x1": allc[:, 2],
                    "y1": allc[:, 3],
                }
            )

    return fn


READING_ORDER_SCHEMA = (
    "doc_id long, block_id long, rank long, "
    "x0 long, y0 long, x1 long, y1 long"
)
