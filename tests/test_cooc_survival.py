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
