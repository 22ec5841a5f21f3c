"""fd_audit: the g3 measure is the MINIMAL repair count — one
injected violation costs exactly one row, and plurality (not first or
majority) is what survives."""
import datetime

import __spark_entry__ as em

T0 = datetime.datetime(2024, 1, 1)


def test_g3_counts_minimal_repairs(spark, tmp_path):
    rows = [
        # event_id -> user_id: event 5 appears twice with TWO users
        # (one violation: delete one row and the FD holds)
        (5, T0, 1, "view", 1.0, "{}"),
        (5, T0, 2, "view", 1.0, "{}"),
        (6, T0, 1, "view", 1.0, "{}"),
        # user 9: types v,v,v,c -> plurality 3, g3 contribution 1
        (10, T0, 9, "view", 1.0, "{}"),
        (11, T0, 9, "view", 1.0, "{}"),
        (12, T0, 9, "view", 1.0, "{}"),
        (13, T0, 9, "click", 1.0, "{}"),
    ]
    df = spark.createDataFrame(
        rows, "event_id bigint, ts timestamp, user_id bigint, "
        "event_type string, value double, props string"
    )
    df.write.mode("overwrite").parquet(str(tmp_path / "events.parquet"))
    out = {r.fd: r for r in em.q_fd_audit(spark, str(tmp_path)).collect()}
    key_fd = out["event_id->user_id"]
    assert key_fd.n_violations == 1 and key_fd.holds is False
    beh = out["user_id->event_type"]
    # user 1 contributes 0 (all 'view'... events 5,6 + clone user2)
    # user 9 contributes exactly 1 (plurality view=3 of 4)
    assert beh.n_violations == 1
    assert out["event_type->user_id"].n_rows == 7
