"""Backward as-of join as a first-class distributed operator.

Spark has no native ASOF JOIN (pandas has merge_asof, DuckDB has
ASOF JOIN; SPARK-22947 never merged).  This implements the classic
union-marker formulation: stack the right rows under the left rows,
sort each key group by (ts, side), and carry the most recent right
payload forward with last(..., ignorenulls=True) over a running
window.  Semantics match DuckDB's `ASOF LEFT JOIN ... ON l.k = r.k
AND l.ts >= r.ts` (backward direction, exact-timestamp matches
allowed), which is also pandas merge_asof(direction="backward",
allow_exact_matches=True).

100 TB shape: ONE hash shuffle on the key columns + a per-partition
sort — exactly the cost of the sort-merge join Spark would pick for
an equi-join on the same keys.  No range cross-product (a naive
l.ts >= r.ts range join explodes to O(|L|·|R|) per key before the
argmax), no per-row Python, no UDF: the whole operator is Exchange +
Sort + Window, all whole-stage-codegen'd JVM.  Skewed keys behave
like any windowed aggregation (salt upstream if one key dominates).

Tie rule: at equal timestamps the right row sorts BEFORE the left row
(side 0 < side 1), so an exact-timestamp right row is visible to the
left row — the >= semantics above.  If the right side has duplicate
(keys, ts) rows the payload columns themselves are the final sort
keys, so the row with the greatest payload tuple wins
deterministically; DuckDB's ASOF is nondeterministic under such ties,
so oracle-gated callers must deduplicate (keys, ts) on the right
side first.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

_SIDE = "__asof_side"


def asof_join_backward(
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    ts: str,
    payload: list[str],
) -> DataFrame:
    """For each left row, attach `payload` columns from the right row
    with equal `on` keys and the greatest right.`ts` <= left.`ts`
    (NULL payloads when no such row exists).

    `right` must contain on + [ts] + payload; payload names must not
    collide with left's columns.  Left rows are returned unchanged
    (all columns, original multiplicity) with payload appended.
    """
    overlap = set(payload) & set(left.columns)
    if overlap:
        raise ValueError(f"payload collides with left columns: {sorted(overlap)}")

    r = right.select(
        *on,
        F.col(ts).alias(ts),
        *[F.col(c) for c in payload],
        F.lit(0).alias(_SIDE),
    )
    r_types = dict(r.dtypes)
    l = left.select(
        "*",
        *[F.lit(None).cast(r_types[c]).alias(c) for c in payload],
        F.lit(1).alias(_SIDE),
    )
    # unionByName(allowMissingColumns) fills left-only columns with
    # typed NULLs on the right rows; those rows are dropped after the
    # window so the NULLs never surface.
    stacked = l.unionByName(r, allowMissingColumns=True)

    w = (
        Window.partitionBy(*on)
        .orderBy(ts, _SIDE, *payload)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = stacked.select(
        *[c for c in left.columns],
        F.col(_SIDE).alias(_SIDE),
        *[F.last(c, ignorenulls=True).over(w).alias(c) for c in payload],
    )
    return carried.filter(F.col(_SIDE) == 1).drop(_SIDE)
