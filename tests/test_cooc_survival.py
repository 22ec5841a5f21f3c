"""Pins for cooccurrence_graph (projection bounds) and survival_km
(life-table invariants with censoring)."""
import __spark_entry__ as em


def test_cooccurrence_bounds(spark, sf_dir):
    out = em.q_cooccurrence_graph(spark, sf_dir).collect()
    # at most C(|types|, 2) edges, canonical ordering, no self-loops
    assert 0 < len(out) <= 10
    users = em.queries()["event_pivot"](spark, sf_dir).count()
    for r in out:
        assert r.type_a < r.type_b
        assert 0 < r.n_users <= users


def test_survival_life_table_invariants(spark, sf_dir):
    rows = sorted(
        em.q_survival_km(spark, sf_dir).collect(), key=lambda r: r.day
    )
    users = em.queries()["event_pivot"](spark, sf_dir).count()
    # day-0 risk set is the whole cohort (every user has SOME duration)
    assert rows[0].n_risk == users
    # the defining recurrence: risk set shrinks by exactly the exits
    for a, b in zip(rows, rows[1:]):
        assert b.n_risk == a.n_risk - a.n_events - a.n_censored
    # everyone exits eventually
    last = rows[-1]
    assert last.n_risk == last.n_events + last.n_censored


def test_interval_coverage_hand_cases(spark, tmp_path):
    """Touching, overlapping, contained and disjoint intervals against
    hand-computed union lengths.  Interval length is 60 + event_id %
    600, so event_id CHOOSES the length — the fixture exploits that to
    build each case exactly."""
    import datetime

    T0 = datetime.datetime(2024, 1, 1, 0, 0, 0)

    def ev(eid, sec, uid):
        return (eid, T0 + datetime.timedelta(seconds=sec), uid,
                "view", 1.0, "{}")

    rows = [
        # user 1: [0,60) and [60,120) touch -> covered 120
        ev(0, 0, 1), ev(0, 60, 1),
        # user 2: [0,300) (eid 240) contains [100,160) (eid 0) and
        # overlaps [250,400) (eid 90) -> union [0,400) = 400
        ev(240, 0, 2), ev(0, 100, 2), ev(90, 250, 2),
        # user 3: disjoint [0,60) and [1000,1060) -> 120, span 1060
        ev(0, 0, 3), ev(0, 1000, 3),
    ]
    df = spark.createDataFrame(
        rows, "event_id bigint, ts timestamp, user_id bigint, "
        "event_type string, value double, props string"
    )
    df.write.mode("overwrite").parquet(str(tmp_path / "events.parquet"))
    import __spark_entry__ as em
    out = {r.user_id: r for r in
           em.q_interval_coverage(spark, str(tmp_path)).collect()}
    assert out[1].covered_sec == 120
    assert out[2].covered_sec == 400
    assert out[3].covered_sec == 120 and out[3].span_sec == 1060
