"""Streaming per-source quota: the cross-restart law that makes it a
real streaming operator — the per-source arrival rank lives in
checkpointed state, so a source that used part of its quota before a
restart hands CONTINUED ranks (and suppression) to docs arriving in a
later resumed run, and already-emitted rows never re-emit."""

import os
import shutil
import tempfile

import pytest

from ocular_spark.streaming.jobs import crawl_quota_stream


@pytest.fixture()
def tmp_root():
    d = tempfile.mkdtemp(prefix="quota_test_")
    yield d
    shutil.rmtree(d, ignore_errors=True)


def _write(spark, rows, path, name):
    (
        spark.createDataFrame(rows, "doc_id long, source string")
        .coalesce(1)
        .write.mode("append")
        .parquet(path)
    )


def test_quota_rank_state_survives_restart(spark, tmp_root):
    docs_dir = os.path.join(tmp_root, "docs")
    out_dir = os.path.join(tmp_root, "out")
    ckpt = os.path.join(tmp_root, "ckpt")

    # run 1: source a uses 2/3 of its quota, source b 1/3
    _write(spark, [(0, "a"), (2, "a"), (1, "b")], docs_dir, "f0")
    q = crawl_quota_stream(spark, docs_dir, out_dir, ckpt, cap=3)
    assert q.awaitTermination(300)
    first = {
        (r.doc_id, r.source): (r.rank, r.kept)
        for r in spark.read.parquet(out_dir).collect()
    }
    assert first == {
        (0, "a"): (1, 1),
        (2, "a"): (2, 1),
        (1, "b"): (1, 1),
    }

    # run 2 (restart from the same checkpoint): source a's two new
    # docs get ranks 3 and 4 -> the second one is SUPPRESSED by state
    # built in run 1; b continues at rank 2; nothing re-emits
    _write(spark, [(10, "a"), (11, "a"), (12, "b")], docs_dir, "f1")
    q = crawl_quota_stream(spark, docs_dir, out_dir, ckpt, cap=3)
    assert q.awaitTermination(300)
    both = {
        (r.doc_id, r.source): (r.rank, r.kept)
        for r in spark.read.parquet(out_dir).collect()
    }
    assert len(both) == 6, "exactly-once emission across restarts"
    assert both[(10, "a")] == (3, 1)
    assert both[(11, "a")] == (4, 0)  # capped BECAUSE of run-1 state
    assert both[(12, "b")] == (2, 1)
    for k, v in first.items():
        assert both[k] == v  # run-1 rows unchanged
