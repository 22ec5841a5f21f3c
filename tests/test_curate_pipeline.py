"""curate_pipeline (the composite driver row): stage-interaction laws
the single-stage gates can't see.

- every stage is NON-VACUOUS on the audit fixture (strictly fewer
  docs after quality, dedup, decontamination, and mix),
- dedup removes exactly the injected +10M copies (and keeps their
  originals),
- no surviving document shares a 13-gram with the benchmark
  sentences (decon ran AFTER redaction, on the bytes that would be
  trained on),
- packing layout is self-consistent per shard (offsets are the
  running sum of survivor token counts in doc_id order).
"""

import os

import __spark_entry__ as em
from ocular_spark.jobs import curate_corpus as cc

TESTDATA = os.environ.get("SPARK_GRAFT_TESTDATA", "/root/testdata")
SF = os.path.join(TESTDATA, "sf0.001")


def _chain_counts(spark):
    base = em._load_wide(spark, SF, "documents").select(
        "doc_id", "lang", "text"
    )
    injected = base.select(
        "doc_id", "lang", em._decon_injected_text().alias("text")
    ).select("doc_id", "lang", em._pii_injected_text().alias("text"))
    dups = injected.filter(
        em.F.col("doc_id") % 100 == em.CURATE_DUP_MOD
    ).select(
        (em.F.col("doc_id") + 10_000_000).alias("doc_id"), "lang", "text"
    )
    d0 = injected.unionByName(dups)
    counts = {"input": d0.count()}
    cur = cc.quality_stage(d0)
    counts["quality"] = cur.count()
    cur = cc.dedup_stage(cur)
    counts["dedup"] = cur.count()
    dd = cur
    cur = cc.pii_stage(cur)
    cur = cc.decontaminate_stage(cur, [em.DECON_CANON, em.DECON_CANON2])
    counts["decon"] = cur.count()
    cur = cc.mix_stage(cur)
    counts["mix"] = cur.count()
    return counts, dd


def test_every_stage_nonvacuous_and_dedup_exact(spark):
    counts, dedup_out = _chain_counts(spark)
    assert counts["input"] > counts["quality"] > counts["dedup"] \
        > counts["decon"] > counts["mix"] > 0, counts
    # dedup must remove every +10M copy and keep all originals
    ids = [r.doc_id for r in dedup_out.select("doc_id").collect()]
    assert all(i < 10_000_000 for i in ids)


def test_no_survivor_shares_benchmark_grams(spark):
    out = em.q_curate_pipeline(spark, SF)
    surv = {r.doc_id for r in out.collect()}
    # contaminated classes: % 100 == 7, % 10 in {4, 9} — all carry a
    # canon sentence, so none may survive the chain
    bad = {i for i in surv if i % 100 == 7 or i % 10 in (4, 9)}
    assert not bad, bad


def test_packing_layout_self_consistent(spark):
    rows = em.q_curate_pipeline(spark, SF).collect()
    by_shard = {}
    for r in rows:
        by_shard.setdefault(r.shard, []).append(r)
    assert len(by_shard) > 1
    for shard, rs in by_shard.items():
        rs.sort(key=lambda r: r.doc_id)
        cum = 0
        for r in rs:
            assert r.seq_id == cum // em.PACK_SEQLEN, (shard, r)
            assert r.seq_offset == cum % em.PACK_SEQLEN, (shard, r)
            cum += r.n_tokens
    # weights come from the per-language mix rates
    valid = {
        round(100.0 / v, 4)
        for v in list(em.TRAIN_MIX_RATES.values()) + [em.TRAIN_MIX_DEFAULT]
    }
    assert {r.weight for r in rows} <= valid
