"""ngram_novelty + decayed_counts laws, and the short-doc regression
for the shingle expressions (sequence(1,0) is DESCENDING in Spark and
slice(arr, 0, n) throws under ANSI — sub-width docs must yield empty
shingle sets, not crashes)."""

import os

import pandas as pd

import __spark_entry__ as em

TESTDATA = os.environ.get("SPARK_GRAFT_TESTDATA", "/root/testdata")
SF = os.path.join(TESTDATA, "sf0.001")


def test_novelty_conservation_and_pandas_recompute(spark):
    rows = em.q_ngram_novelty(spark, SF).collect()
    got = {r.doc_id: (r.n_shingles, r.n_novel) for r in rows}

    docs = pd.read_parquet(os.path.join(SF, "documents.parquet"))
    n = em.NOVELTY_N
    seen = {}
    per_doc = {}
    for doc_id, text in sorted(zip(docs["doc_id"], docs["text"])):
        ts = text.split(" ")
        grams = {" ".join(ts[i : i + n]) for i in range(len(ts) - n + 1)}
        per_doc[doc_id] = grams
        for g in grams:
            seen.setdefault(g, doc_id)
    for doc_id, grams in per_doc.items():
        novel = sum(1 for g in grams if seen[g] == doc_id)
        assert got[doc_id] == (len(grams), novel), doc_id
    # conservation: every distinct gram is novel in exactly one doc
    assert sum(v[1] for v in got.values()) == len(seen)
    # the earliest doc is fully novel by construction
    first = min(got)
    assert got[first][1] == got[first][0]


def test_shingle_short_doc_safety(spark):
    from ocular_spark.jobs import curate_corpus as cc

    d = spark.createDataFrame(
        [(1, "one"), (2, "two words"), (3, "a b c d"),
         (4, "a b c d e f g h i j k l m n o p q r s t u v w x y z")],
        "doc_id long, text string",
    )
    # novelty expression path (5-grams)
    n = em.NOVELTY_N
    sh = (
        f"array_distinct(CASE WHEN size(split(text, ' ')) >= {n}"
        f" THEN transform(sequence(1, size(split(text, ' ')) - {n - 1}),"
        f"  i -> xxhash64(array_join(slice(split(text, ' '), i, {n}), ' ')))"
        f" ELSE cast(array() as array<bigint>) END)"
    )
    sizes = {
        r.doc_id: r.ns
        for r in d.select(
            "doc_id", em.F.size(em.F.expr(sh)).alias("ns")
        ).collect()
    }
    assert sizes == {1: 0, 2: 0, 3: 0, 4: 22}
    # curate decontaminate stage must survive sub-13-word docs
    out = cc.decontaminate_stage(d, [em.DECON_CANON]).collect()
    assert {r.doc_id for r in out} == {1, 2, 3, 4}


def test_decayed_counts_exact_integer_law(spark):
    rows = em.q_decayed_counts(spark, SF).collect()
    assert rows
    ev = pd.read_parquet(os.path.join(SF, "events.parquet"))
    anchor = ev["ts"].max()
    mx, hl = em.DECAY_MAX_AGE, em.DECAY_HALFLIFE_BUCKETS
    for r in rows:
        sub = ev[ev["event_type"] == r.event_type]
        ages = (
            ((anchor - sub["ts"]).dt.total_seconds() * 1_000_000)
            .astype("int64")
            // em.DECAY_BUCKET_US
            // hl
        ).clip(upper=mx)
        num = int(sum(1 << (mx - a) for a in ages))
        assert r.n_events == len(sub)
        assert r.decay_num == num, r.event_type
        assert r.decayed_count == round(num / float(2 ** mx), 6)
        assert r.decayed_count <= r.n_events
