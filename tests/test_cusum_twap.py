"""Pins for cusum_drift (the prefix-min linearization of the CUSUM
recursion) and twap (step-function integral): each checked against an
independent plain-Python fold on adversarial inputs."""
import datetime

from hypothesis import given, settings
from hypothesis import strategies as st

import __spark_entry__ as em

T0 = datetime.datetime(2024, 1, 1, 0, 0, 0)


def _cusum_fold(ds):
    """The literal Page recursion S_i = max(0, S_{i-1} + d_i)."""
    s, out = 0, []
    for d in ds:
        s = max(0, s + d)
        out.append(s)
    return out


def _cusum_linear(ds):
    """The closed form the Spark row computes: c_i - min(0, min c_j)."""
    out, c, m = [], 0, 0
    for d in ds:
        c += d
        m = min(m, c)
        out.append(c - min(m, 0))
    return out


@settings(max_examples=300, deadline=None)
@given(st.lists(st.integers(min_value=-50000, max_value=50000),
                min_size=0, max_size=60))
def test_cusum_linearization_equals_recursion(ds):
    assert _cusum_linear(ds) == _cusum_fold(ds)


def _events(spark, rows):
    return spark.createDataFrame(
        rows, "event_id bigint, ts timestamp, user_id bigint, "
        "event_type string, value double, props string"
    )


def _run(q, spark, df, tmp_path):
    df.write.mode("overwrite").parquet(str(tmp_path / "events.parquet"))
    return q(spark, str(tmp_path))


def test_cusum_drift_spark_matches_fold(spark, tmp_path):
    """End-to-end on a hand fixture whose walk dips below zero (the
    clamp matters), re-crosses the alarm line twice, and includes a
    user that never alarms."""
    k, h = em._CUSUM_K, em._CUSUM_H
    # user 1 values (cents): +20000 over k, then crash, then two runs
    vals1 = [300.0, 300.0, 1.0, 1.0, 300.0, 300.0, 300.0, 1.0]
    vals2 = [100.0, 100.0, 100.0]  # hovers at k: never alarms
    rows = []
    for i, v in enumerate(vals1):
        rows.append((i, T0 + datetime.timedelta(seconds=10 * i), 1,
                     "view", v, "{}"))
    for i, v in enumerate(vals2):
        rows.append((100 + i, T0 + datetime.timedelta(seconds=10 * i), 2,
                     "view", v, "{}"))
    out = {r.user_id: r for r in _run(
        em.q_cusum_drift, spark, _events(spark, rows), tmp_path).collect()}

    s1 = _cusum_fold([int(v * 100) - k for v in vals1])
    assert out[1].max_cusum == max(s1)
    assert out[1].n_alarms == sum(1 for s in s1 if s > h)
    assert out[1].first_alarm_rn == 1 + min(
        i for i, s in enumerate(s1) if s > h)
    assert out[2].n_alarms == 0 and out[2].first_alarm_rn == 0


def test_twap_weights_and_single_event(spark, tmp_path):
    """The step integral weights each value by the gap to its
    successor; the final observation (and a single-event user) has
    zero width."""
    rows = [
        # user 1: value 2.00 held 10 s, then 4.00 held 30 s, then tail
        (0, T0, 1, "view", 2.00, "{}"),
        (1, T0 + datetime.timedelta(seconds=10), 1, "view", 4.00, "{}"),
        (2, T0 + datetime.timedelta(seconds=40), 1, "view", 99.0, "{}"),
        # user 2: one event -> zero-width integral
        (3, T0, 2, "view", 50.0, "{}"),
    ]
    out = {r.user_id: r for r in _run(
        em.q_twap, spark, _events(spark, rows), tmp_path).collect()}
    assert out[1].twap_num == 200 * 10 + 400 * 30
    assert out[1].twap_dur == 40 and out[1].n_obs == 3
    assert out[2].twap_num == 0 and out[2].twap_dur == 0
    assert out[2].n_obs == 1
