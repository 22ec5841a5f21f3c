"""Exact-substring duplicated-mass (dup_substring): naive Python
interval-union reference on hand documents, injected-passage
positives, and plan shape.  The driver gate regroups on raw gram
strings in DuckDB (also certifying xxhash64 collision-freeness)."""

import pytest

from pyspark.sql import functions as F

import __spark_entry__ as entry_mod
from __spark_entry__ import DUPSUB_K, DUPSUB_PASSAGE


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def _naive_dup_mass(texts, k):
    """Independent reference: per doc, union of [p, p+k) intervals
    whose k-gram occurs in another doc (set-of-positions, no interval
    arithmetic)."""
    from collections import defaultdict

    owners = defaultdict(set)
    for did, t in texts.items():
        for p in range(len(t) - k + 1):
            owners[t[p : p + k]].add(did)
    out = {}
    for did, t in texts.items():
        covered = set()
        starts = 0
        for p in range(len(t) - k + 1):
            if len(owners[t[p : p + k]]) >= 2:
                covered.update(range(p, p + k))
                starts += 1
        out[did] = (starts, len(covered))
    return out


def _run_operator(spark, texts, k):
    """Drive the same plan shape as q_dup_substring on a literal
    frame (no injection)."""
    from pyspark.sql.window import Window

    df = spark.createDataFrame(list(texts.items()), "doc_id long, t string")
    grams = df.select(
        "doc_id",
        F.explode(
            F.expr(
                f"CASE WHEN length(t) >= {k} THEN"
                f" transform(sequence(1, length(t) - {k} + 1),"
                f" p -> named_struct('p', p, 'h', xxhash64(substring(t, p, {k}))))"
                " ELSE array() END"
            )
        ).alias("g"),
    ).select("doc_id", "g.p", "g.h")
    dup = (
        grams.groupBy("h").agg(F.countDistinct("doc_id").alias("nd"))
        .filter(F.col("nd") >= 2).select("h")
    )
    w = Window.partitionBy("doc_id").orderBy("p")
    cov = (
        grams.join(dup, "h")
        .select("doc_id", "p", F.lead("p").over(w).alias("np"))
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("starts"),
            F.sum(
                F.coalesce(
                    F.least(F.lit(k).cast("long"), F.col("np") - F.col("p")),
                    F.lit(k).cast("long"),
                )
            ).alias("mass"),
        )
    )
    got = {r["doc_id"]: (r["starts"], r["mass"]) for r in cov.collect()}
    return {d: got.get(d, (0, 0)) for d in texts}


def test_interval_union_matches_naive(spark):
    """Overlapping runs, disjoint islands, a shared passage at
    different offsets, and a unique doc."""
    shared = "x" * 3 + "abcdefghij" * 2  # 23 chars, k=8 -> run of starts
    texts = {
        1: "one unique prefix " + shared + " tail one",
        2: shared + " totally different middle " + shared[::-1],
        3: "no overlap here at all zzz qqq www",
        4: "pre " + shared[::-1] + " post",  # reversed shared with doc 2
    }
    k = 8
    assert _run_operator(spark, texts, k) == {
        d: v for d, v in _naive_dup_mass(texts, k).items()
    }


def test_adjacent_and_gapped_flags_hand_computed(spark):
    """Two docs sharing two disjoint passages: coverage adds exactly
    (no double count at the join seam)."""
    a = "AAAAAAAAAAAA"  # 12 chars
    b = "BBBBBBBBBBBB"
    texts = {1: a + "-1-" + b, 2: b + "=22=" + a}
    k = 6
    got = _run_operator(spark, texts, k)
    naive = _naive_dup_mass(texts, k)
    assert got == naive
    # each doc: both 12-char blocks fully covered = 24 chars
    assert got[1][1] == 24 and got[2][1] == 24


def test_injected_passage_positives(spark, sf_dir):
    out = entry_mod.q_dup_substring(spark, sf_dir)
    rows = out.filter(F.col("doc_id") % 50 == 9).collect()
    assert rows
    plen = len(DUPSUB_PASSAGE)
    assert all(r["dup_chars"] >= plen for r in rows), [
        (r["doc_id"], r["dup_chars"]) for r in rows
    ]
    # and the background is non-vacuous but not saturated
    frac = out.agg(F.avg((F.col("dup_chars") > 0).cast("int"))).first()[0]
    assert 0.05 < frac < 1.0


def test_dup_substring_plan(spark, sf_dir):
    plan = _plan(entry_mod.q_dup_substring(spark, sf_dir))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoop" not in plan
    # the coverage window partitions by doc_id only
    assert "Window" in plan
