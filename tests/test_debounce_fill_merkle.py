"""Behavior pins for rows 135-137: merkle_digest (divergence
localization), fill_forward (LOCF with leading-gap semantics), and
debounce_events (last-KEPT cooldown, not gap-to-previous)."""
import datetime

import __spark_entry__ as em

T0 = datetime.datetime(2024, 1, 1, 0, 0, 0)


def _events(spark, rows):
    return spark.createDataFrame(
        rows, "event_id bigint, ts timestamp, user_id bigint, "
        "event_type string, value double, props string"
    )


def _write(df, tmp_path, name="events"):
    df.write.mode("overwrite").parquet(str(tmp_path / f"{name}.parquet"))


def test_debounce_is_cooldown_not_gap(spark, tmp_path):
    """Events at t=0, 500, 1000 s: the 600 s cooldown keeps 0 and
    1000 (1000 is measured against the last KEPT event at 0, not the
    suppressed one at 500).  A gap-to-previous-row rule would wrongly
    drop 1000 — this is exactly why the fold doesn't linearize."""
    rows = [
        (0, T0, 1, "view", 1.0, "{}"),
        (1, T0 + datetime.timedelta(seconds=500), 1, "view", 1.0, "{}"),
        (2, T0 + datetime.timedelta(seconds=1000), 1, "view", 1.0, "{}"),
        # second user: suppression never crosses users
        (3, T0 + datetime.timedelta(seconds=500), 2, "view", 1.0, "{}"),
    ]
    _write(_events(spark, rows), tmp_path)
    kept = sorted(r.event_id for r in
                  em.q_debounce_events(spark, str(tmp_path)).collect())
    assert kept == [0, 2, 3]


def test_fill_forward_leading_gap_stays_null(spark, tmp_path):
    """event_id % 7 == 0 readings are nulled; a LEADING null (no prior
    observation) must stay null and must NOT be flagged imputed."""
    rows = [
        (7, T0, 1, "view", 5.0, "{}"),                                # nulled, leading
        (1, T0 + datetime.timedelta(seconds=10), 1, "view", 2.0, "{}"),
        (14, T0 + datetime.timedelta(seconds=20), 1, "view", 9.0, "{}"),  # nulled
        (2, T0 + datetime.timedelta(seconds=30), 1, "view", 3.0, "{}"),
    ]
    _write(_events(spark, rows), tmp_path)
    out = {r.event_id: r for r in
           em.q_fill_forward(spark, str(tmp_path)).collect()}
    assert out[7].cents_filled is None and out[7].was_imputed is False
    assert out[1].cents_filled == 200 and out[1].was_imputed is False
    assert out[14].cents_filled == 200 and out[14].was_imputed is True
    assert out[2].cents_filled == 300


def test_merkle_digest_localizes_divergence(spark, tmp_path):
    """The anti-entropy property: perturbing ONE row changes exactly
    the digest of that row's bucket and nothing else — so replica
    comparison narrows divergence to one key range."""
    li = spark.createDataFrame(
        [(k, 1, float(k % 50 + 1), 1000.0 + k) for k in range(1, 201)],
        "l_orderkey bigint, l_linenumber bigint, "
        "l_quantity double, l_extendedprice double",
    )
    li.write.mode("overwrite").parquet(str(tmp_path / "lineitem.parquet"))
    base = {r.bucket: r.digest for r in
            em.q_merkle_digest(spark, str(tmp_path)).collect()}

    li2 = spark.createDataFrame(
        [(k, 1, float(k % 50 + 1), (1000.0 + k) if k != 37 else 9999.0)
         for k in range(1, 201)],
        "l_orderkey bigint, l_linenumber bigint, "
        "l_quantity double, l_extendedprice double",
    )
    li2.write.mode("overwrite").parquet(str(tmp_path / "lineitem.parquet"))
    pert = {r.bucket: r.digest for r in
            em.q_merkle_digest(spark, str(tmp_path)).collect()}
    diff = [b for b in base if base[b] != pert[b]]
    assert diff == [37 % 64]
