"""Session-15 batch-1 laws: Spearman vs pandas average-rank + rank-only
invariance, Gini sorted-prefix == mean-absolute-difference integer
identity + transfer principle, top-paths independent pandas replay +
conservation."""
import os

import pandas as pd

import __spark_entry__ as em

SF01 = "/root/testdata/sf0.01"


def _docs():
    return pd.read_parquet(os.path.join(SF01, "documents.parquet"))


def _spearman_ref(x: pd.Series, y: pd.Series) -> float:
    # independent formulation: pandas average ranks + the plain
    # Pearson moment formula in float (scipy is not installed; the
    # Spark side uses exact-integer 2*avgrank sums instead)
    import numpy as np

    rx = x.rank(method="average").to_numpy(dtype=float)
    ry = y.rank(method="average").to_numpy(dtype=float)
    rx -= rx.mean()
    ry -= ry.mean()
    return float(
        (rx * ry).sum()
        / np.sqrt((rx * rx).sum() * (ry * ry).sum())
    )


def test_spearman_matches_pandas_and_is_rank_only(spark):
    out = em.q_spearman_corr(spark, SF01).toPandas().set_index("source")
    docs = _docs()
    docs["y"] = docs["text"].str.split(" ").str.len()
    ties_x = ties_y = 0
    for src, g in docs.groupby("source"):
        ref = _spearman_ref(g["n_chars"], g["y"])
        got = float(out.loc[src, "rho"])
        assert abs(got - ref) < 1e-6, (src, got, ref)
        # rank-only dependence: a strictly monotone transform of x
        # cannot change Spearman (the reference restates the property
        # the Spark expression must satisfy transitively)
        ref3 = _spearman_ref(g["n_chars"] ** 3, g["y"])
        assert abs(ref3 - ref) < 1e-12
        ties_x += len(g) - g["n_chars"].nunique()
        ties_y += len(g) - g["y"].nunique()
    # the average-rank tie path is actually exercised
    assert ties_x > 0 and ties_y > 0
    assert (out["rho"].abs() <= 1.0).all()


def test_gini_integer_identity_and_transfer(spark):
    out = (
        em.q_gini_concentration(spark, SF01).toPandas().set_index("source")
    )
    docs = _docs()
    for src, g in docs.groupby("source"):
        xs = sorted(int(v) for v in g["n_chars"])
        n, tot = len(xs), sum(xs)
        # independent O(n^2) formulation: sum_{i,j} |xi - xj| is
        # EXACTLY 2 * (2*sum i*x_(i) - (n+1)*sum x) in integers
        mad = sum(abs(a - b) for a in xs for b in xs)
        num = int(out.loc[src, "gini_num"])
        assert mad == 2 * num, src
        assert int(out.loc[src, "n_docs"]) == n
        assert int(out.loc[src, "total_chars"]) == tot
        assert abs(float(out.loc[src, "gini"]) - num / (n * tot)) < 5e-7
        assert 0.0 <= num / (n * tot) < 1.0
        # transfer principle: moving one char from the largest doc to
        # the smallest weakly decreases the numerator
        if xs[-1] - xs[0] >= 2:
            ys = sorted(xs[1:-1] + [xs[0] + 1, xs[-1] - 1])
            num2 = 2 * sum((i + 1) * y for i, y in enumerate(ys)) - (
                n + 1
            ) * sum(ys)
            assert num2 <= num, src


def test_top_paths_pandas_replay_and_conservation(spark):
    out = em.q_top_paths(spark, SF01).toPandas()
    ev = pd.read_parquet(os.path.join(SF01, "events.parquet"))
    ev = ev.sort_values(["user_id", "ts", "event_id"])
    paths = (
        ev.groupby("user_id")["event_type"]
        .apply(lambda s: ">".join(s.head(em.TOP_PATHS_LEN)))
        .rename("path")
    )
    full = (
        paths.value_counts()
        .rename_axis("path")
        .reset_index(name="n_users")
        .sort_values(["n_users", "path"], ascending=[False, True])
        .reset_index(drop=True)
    )
    # conservation: every user contributes exactly one path
    assert int(full["n_users"].sum()) == ev["user_id"].nunique()
    top = full.head(em.TOP_PATHS_K)
    got = out.sort_values("rank_idx").reset_index(drop=True)
    assert list(got["path"]) == list(top["path"])
    assert list(got["n_users"].astype(int)) == list(
        top["n_users"].astype(int)
    )
    assert list(got["rank_idx"].astype(int)) == list(
        range(1, em.TOP_PATHS_K + 1)
    )
    # non-vacuous ranking: shared paths exist inside the cut
    assert int(got["n_users"].max()) > 1
