"""r6 plan-shape regression tests for the ten rows VERDICT r5 flagged
as corpus-sized unpartitioned windows (What's wrong #2): after the
_global_row_number / TakeOrdered / arithmetic-NTILE rework, no Window
operator in their physical plans may sit on an Exchange SinglePartition
(the "No Partition Defined for Window operation" scale-killer).
Scalar aggregates legitimately produce SinglePartition exchanges over
already-combined 1-row partials — only WINDOWS over them are flagged.
"""

import pytest
from pyspark.sql import SparkSession

SF = "/root/testdata/sf0.001"

REPLANNED = [
    "threshold_topk",
    "zipf_fit",
    "bh_fdr",
    "holm_bonferroni",
    "cdx_surt_index",
    "rfm_segments",
    "lru_stack_distance",
    "stratified_att",
    "simpson_detector",
    "gains_table",
]


@pytest.fixture(scope="module")
def spark():
    s = (
        SparkSession.builder.master("local[4]")
        .config("spark.sql.shuffle.partitions", "4")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    yield s


def _iter_nodes(node):
    yield node
    ch = node.children()
    for i in range(ch.size()):
        yield from _iter_nodes(ch.apply(i))


def _first_exchange_below(node):
    """Walk the (single-child) chain below a Window to the first
    Exchange; Window always has exactly one child."""
    cur = node
    while True:
        ch = cur.children()
        if ch.size() == 0:
            return None
        cur = ch.apply(0)
        name = cur.nodeName()
        if "Exchange" in name:
            return cur


def _assert_no_single_partition_window(df, name):
    plan = df._jdf.queryExecution().sparkPlan()
    for node in _iter_nodes(plan):
        if node.nodeName() == "Window":
            ex = _first_exchange_below(node)
            if ex is None:
                continue
            head = str(ex).splitlines()[0]
            assert "SinglePartition" not in head, (
                f"{name}: Window over Exchange SinglePartition:\n{head}"
            )


@pytest.mark.parametrize("name", REPLANNED)
def test_no_corpus_sized_global_window(spark, name):
    import __spark_entry__ as em

    df = em.queries()[name](spark, SF)
    _assert_no_single_partition_window(df, name)
