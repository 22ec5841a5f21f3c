"""Measure IVF ANN recall vs brute-force cosine top-3.

Runs q_embed_ivf_topk (trained spherical-k-means codebook, nprobe=2)
and the exact brute-force top-3 over the same probes, and reports
recall = |IVF top-3 ∩ exact top-3| / |exact top-3|.  Records the
number cited in the q_embed_ivf_topk docstring."""
import sys, os

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from pyspark.sql import SparkSession, functions as F

import __spark_entry__ as em


def recall(spark, sf_dir):
    ivf = {
        (r.probe_id, r.vec_id)
        for r in em.q_embed_ivf_topk(spark, sf_dir).collect()
    }
    exact = {
        (r.probe_id, r.vec_id)
        for r in em.q_embed_topk(spark, sf_dir).filter(F.col("probe_id") < 10).collect()
    }
    return len(ivf & exact) / len(exact), len(exact)


if __name__ == "__main__":
    spark = (
        SparkSession.builder.master("local[8]")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.driver.memory", "8g")
        .appName("ivf-recall")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    for sf in sys.argv[1:] or ["/root/testdata/sf0.01", "/root/testdata/sf0.1"]:
        r, n = recall(spark, sf)
        print(f"{sf}: recall@3 = {r:.3f} over {n} exact pairs")
    spark.stop()
