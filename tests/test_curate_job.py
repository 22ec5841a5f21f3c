"""End-to-end curation chain (jobs/curate_corpus.py): every stage
must act on a doc designed to trigger it, the manifest must account
for every drop, and a resumed run must append exactly the new docs
under a fresh pack epoch without touching prior layout."""

import os
from argparse import Namespace

import pyspark.sql.functions as F

import __spark_entry__ as entry_mod
from ocular_spark.jobs.curate_corpus import run

GOOD = (
    "the quick students walked to the library and read many books about "
    "science while the teachers prepared lessons for the coming week and "
    "everyone enjoyed the quiet afternoon in the reading room near campus"
)  # 33 words, stopword-rich, alphabetic


def _docs(spark, rows):
    return spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    ).withColumn("n_chars", F.length("text").cast("long"))


def _base_rows():
    rows = []
    # 8 good docs (doc_id chosen so the mix hash keeps 'en' @ 62%)
    for i in range(8):
        rows.append((i, GOOD + f" variant {i}", "en", "src0", 0))
    rows.append((100, "too short", "en", "src0", 0))          # quality drop
    rows.append((101, GOOD + " variant 0", "en", "src0", 0))  # exact dup of 0
    rows.append((102, GOOD + " contact me at bob@example.com now", "en", "src0", 0))
    rows.append((103, GOOD + " " + entry_mod.DECON_CANON, "en", "src0", 0))
    return rows


def test_curation_chain_stages_and_manifest(spark, tmp_path):
    docs_dir = str(tmp_path / "docs")
    out_dir = str(tmp_path / "out")
    man_dir = str(tmp_path / "manifest")
    _docs(spark, _base_rows()).write.parquet(docs_dir)

    args = Namespace(docs=docs_dir, output=out_dir, manifest=man_dir,
                     resume_from=None,
                     benchmark=[entry_mod.DECON_CANON, entry_mod.DECON_CANON2])
    res = run(spark, args)
    stages = {s: (a, b) for s, a, b in res["stages"]}
    assert stages["quality"] == (12, 11)        # 'too short' dropped
    assert stages["dedup_exact"] == (11, 10)    # clone of doc 0 dropped
    assert stages["pii_redact"] == (10, 10)     # rewrite, no drop
    assert stages["decontaminate"] == (10, 9)   # canon carrier dropped
    kept_in, kept_out = stages["training_mix"]
    assert kept_in == 9 and 0 < kept_out <= 9   # hash-mod selection

    out = spark.read.parquet(out_dir)
    rows = {r.doc_id: r for r in out.collect()}
    assert 100 not in rows and 101 not in rows and 103 not in rows
    if 102 in rows:  # survived the mix -> must be redacted
        assert "<EMAIL>" in rows[102].text and "bob@example.com" not in rows[102].text
    # pack layout: prefix-sum invariant per shard
    for shard in {r.shard for r in rows.values()}:
        docs = sorted((r for r in rows.values() if r.shard == shard),
                      key=lambda r: r.doc_id)
        cum = 0
        for r in docs:
            assert r.seq_id * entry_mod.PACK_SEQLEN + r.seq_offset == cum
            cum += r.n_tokens
    assert all(r.pack_epoch == 0 for r in rows.values())

    man = {r.stage: (r.n_in, r.n_out)
           for r in spark.read.parquet(man_dir).collect()}
    assert man["quality"] == (12, 11)

    # resume: two new good docs (+ one already-processed id is absent
    # from the new input by construction) append under epoch 1
    more = _base_rows() + [
        (200, GOOD + " fresh doc alpha", "en", "src0", 0),
        (201, GOOD + " fresh doc beta", "en", "src0", 0),
    ]
    _docs(spark, more).write.mode("overwrite").parquet(docs_dir)
    args2 = Namespace(docs=docs_dir, output=out_dir, manifest=man_dir,
                      resume_from=out_dir,
                      benchmark=[entry_mod.DECON_CANON, entry_mod.DECON_CANON2])
    res2 = run(spark, args2)
    assert res2["epoch"] == 1
    out2 = spark.read.parquet(out_dir)
    olds = out2.filter(F.col("pack_epoch") == 0)
    news = out2.filter(F.col("pack_epoch") == 1)
    # prior layout untouched; only genuinely-new surviving docs added
    assert olds.count() == len(rows)
    new_ids = {r.doc_id for r in news.collect()}
    assert new_ids <= {100, 101, 102, 103, 200, 201} - set(rows)
    # 200/201 pass every gate; subject only to the mix hash
    for r in news.collect():
        assert r.seq_id * entry_mod.PACK_SEQLEN + r.seq_offset >= 0
