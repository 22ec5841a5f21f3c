"""Pins for sales_cube (grouping-flag contract) and
stratified_sample (no stratum starved; exact quotas)."""
import __spark_entry__ as em


def test_cube_contains_all_four_lattice_levels(spark, sf_dir):
    out = em.q_sales_cube(spark, sf_dir).collect()
    levels = {(r.g_status, r.g_priority) for r in out}
    assert levels == {(0, 0), (0, 1), (1, 0), (1, 1)}
    # grand total appears exactly once and equals the sum of the
    # finest level (the lattice-consistency invariant)
    total = [r for r in out if (r.g_status, r.g_priority) == (1, 1)]
    fine = [r for r in out if (r.g_status, r.g_priority) == (0, 0)]
    assert len(total) == 1
    assert total[0].n_orders == sum(r.n_orders for r in fine)
    assert total[0].sum_cents == sum(r.sum_cents for r in fine)


def test_stratified_sample_never_starves_a_stratum(spark, tmp_path):
    """A 3-doc stratum next to a 300-doc stratum: global 10% Bernoulli
    expects 0.3 docs from the small one; the quota rule guarantees 1,
    and the big one gets exactly 30."""
    rows = [(i, "x" * 5, "big", "web", 5) for i in range(300)]
    rows += [(1000 + i, "y" * 5, "tiny", "web", 5) for i in range(3)]
    df = spark.createDataFrame(
        rows, "doc_id bigint, text string, lang string, "
        "source string, n_chars bigint"
    )
    df.write.mode("overwrite").parquet(str(tmp_path / "documents.parquet"))
    out = em.q_stratified_sample(spark, str(tmp_path)).collect()
    by_lang = {}
    for r in out:
        by_lang.setdefault(r.lang, []).append(r)
    assert len(by_lang["big"]) == 30
    assert len(by_lang["tiny"]) == 1
    # deterministic: the same input yields the same sample
    out2 = em.q_stratified_sample(spark, str(tmp_path)).collect()
    assert sorted(r.doc_id for r in out2) == sorted(r.doc_id for r in out)
