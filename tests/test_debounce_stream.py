"""Streaming debounce: the cross-restart law that makes it a real
streaming operator — the last-kept second lives in checkpointed
state, so suppression continues across a restart, and kept rows
never re-emit."""
import os
import shutil
import tempfile

import pytest

from ocular_spark.streaming.jobs import debounce_stream


@pytest.fixture()
def tmp_root():
    d = tempfile.mkdtemp(prefix="debounce_test_")
    yield d
    shutil.rmtree(d, ignore_errors=True)


def _write(spark, rows, path):
    (
        spark.createDataFrame(
            rows, "event_id long, user_id long, ts_sec long"
        )
        .coalesce(1)
        .write.mode("append")
        .parquet(path)
    )


def test_debounce_state_survives_restart(spark, tmp_root):
    ev_dir = os.path.join(tmp_root, "events")
    out_dir = os.path.join(tmp_root, "out")
    ckpt = os.path.join(tmp_root, "ckpt")

    # run 1: user 1 keeps t=0, suppresses t=500
    _write(spark, [(0, 1, 0), (1, 1, 500)], ev_dir)
    q = debounce_stream(spark, ev_dir, out_dir, ckpt, gap=600)
    assert q.awaitTermination(300)
    first = sorted(r.event_id for r in spark.read.parquet(out_dir).collect())
    assert first == [0]

    # run 2 (same checkpoint): t=550 arrives AFTER the restart — it is
    # 550 s after the last KEPT event (t=0, run-1 state), so still
    # suppressed; t=700 clears the cooldown and resets it; t=1200 is
    # only 500 s after the NEW last-kept (700) -> suppressed
    _write(spark, [(2, 1, 550), (3, 1, 700), (4, 1, 1200)], ev_dir)
    q = debounce_stream(spark, ev_dir, out_dir, ckpt, gap=600)
    assert q.awaitTermination(300)
    both = sorted(r.event_id for r in spark.read.parquet(out_dir).collect())
    assert both == [0, 3], "state continued across the restart, no re-emits"
