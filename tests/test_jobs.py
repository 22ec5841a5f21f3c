"""Job-level tests: extract-lines intermediate table + FlipUV reader."""

import os

import numpy as np
import pyarrow.parquet as pq
import pytest


def test_flip_uv_reader_deterministic():
    from ocular_spark.textread import BasicTextReader, FlipUVTextReader

    tr1 = FlipUVTextReader(0.5, BasicTextReader())
    out1 = tr1.read_characters("uv vu under very")
    tr2 = FlipUVTextReader(0.5, BasicTextReader())
    out2 = tr2.read_characters("uv vu under very")
    assert out1 == out2  # Random(0) stream is fixed
    # rate 1.0 keeps everything; rate ~0 flips everything
    keep = FlipUVTextReader(1.0, BasicTextReader()).read_characters("uvUV")
    assert keep == ["u", "v", "U", "V"]
    flip = FlipUVTextReader(0.0, BasicTextReader()).read_characters("uvUV")
    assert flip == ["v", "u", "V", "U"]


def test_extract_lines_table(spark, sf_dir):
    from ocular_spark.fixtures import (
        build_models,
        derive_docs_and_media,
        media_lines_to_page_pngs,
    )
    from ocular_spark.jobs.extract_lines import extract_lines_table
    from ocular_spark.pipeline import unpack_line

    documents = pq.read_table(os.path.join(sf_dir, "documents.parquet")).to_pandas()
    docs, media = derive_docs_and_media(
        documents, n_docs=2, max_pages_per_doc=1, noise_levels=(0.0,)
    )
    pages = media_lines_to_page_pngs(media, skew=False)
    out = extract_lines_table(
        spark.createDataFrame(pages[["media_ref", "page_png"]]),
        em_restarts=20, num_partitions=2,
    ).toPandas().sort_values("media_ref").reset_index(drop=True)
    want = media.sort_values("media_ref").reset_index(drop=True)
    assert list(out["media_ref"]) == list(want["media_ref"])
    # extracted line counts match the ground truth page composition
    assert list(out["n_lines"]) == list(want["n_lines"])
    for lines in out["lines"]:
        for raw in lines:
            img = unpack_line(raw)
            assert img.shape[1] == 30
            assert (img == 1).any()


def test_initialize_models_job(tmp_path, sf_dir):
    """InitializeLanguageModel/Font/GSM equivalents in one job; empty
    corpus raises (NoDocumentsFoundException semantics)."""
    import os
    import pickle
    import subprocess
    import sys

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    models = tmp_path / "models.pkl"
    gsm = tmp_path / "gsm.pkl"
    r = subprocess.run(
        [sys.executable, os.path.join(repo, "ocular_spark/jobs/initialize_models.py"),
         "--corpus", os.path.join(sf_dir, "documents.parquet"),
         "--models-out", str(models), "--gsm-out", str(gsm)],
        capture_output=True, text=True,
    )
    assert r.returncode == 0, r.stderr[-800:]
    with open(models, "rb") as f:
        font_bytes, lm = pickle.load(f)
    ci = lm.get_character_indexer()
    assert ci.contains("-")  # hyphen forced in (InitializeLanguageModel:272-274)
    assert lm.get_max_order() == 3
    from ocular_spark.font import Font

    font = Font.from_bytes(font_bytes)
    assert font.get(" ").is_space
    with open(gsm, "rb") as f:
        factory, gsm_model = pickle.load(f)
    assert gsm_model.glyph_prob(0, ci.get_index("a"), 5, ci.get_index("a")) > 0

    # empty corpus -> NoDocumentsFoundException semantics
    import pandas as pd

    empty = tmp_path / "empty.parquet"
    pd.DataFrame({"text": []}).to_parquet(empty)
    r2 = subprocess.run(
        [sys.executable, os.path.join(repo, "ocular_spark/jobs/initialize_models.py"),
         "--corpus", str(empty), "--models-out", str(tmp_path / "m2.pkl")],
        capture_output=True, text=True,
    )
    assert r2.returncode != 0 and "NoDocumentsFound" in r2.stderr


def test_spark_submit_py_files_launch(tmp_path, sf_dir):
    """The production launch surface (north rule: 'run via spark-submit
    --py-files'): package ocular_spark into a zip, copy the job script
    OUTSIDE the repo, scrub PYTHONPATH, and run a real `spark-submit
    --py-files ocular_spark.zip extract_lines.py` — the zip must be the
    ONLY source of the package on the driver and the Python workers
    (the mapInPandas kernel imports ocular_spark.preprocess
    executor-side).  Asserts the job's output table matches the ground
    truth page composition."""
    import shutil
    import subprocess
    import sys
    import zipfile

    import pandas as pd

    spark_submit = shutil.which("spark-submit")
    if spark_submit is None:
        pytest.skip("spark-submit not on PATH")

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    pkg = os.path.join(repo, "ocular_spark")
    zpath = tmp_path / "ocular_spark.zip"
    with zipfile.ZipFile(zpath, "w", zipfile.ZIP_DEFLATED) as z:
        for root, dirs, files in os.walk(pkg):
            dirs[:] = [d for d in dirs if d != "__pycache__"]
            for f in files:
                if f.endswith(".py"):
                    full = os.path.join(root, f)
                    z.write(full, os.path.relpath(full, repo))

    # tiny input: 2 single-page docs rendered to page PNGs (in-process,
    # using the repo fixtures — only the SUBPROCESS must rely on the zip)
    from ocular_spark.fixtures import (
        derive_docs_and_media,
        media_lines_to_page_pngs,
    )

    documents = pq.read_table(os.path.join(sf_dir, "documents.parquet")).to_pandas()
    docs, media = derive_docs_and_media(
        documents, n_docs=2, max_pages_per_doc=1, noise_levels=(0.0,)
    )
    pages = media_lines_to_page_pngs(media, skew=False)
    media_pq_path = tmp_path / "media_pages.parquet"
    pd.DataFrame(
        {"media_ref": pages["media_ref"], "page_png": pages["page_png"]}
    ).to_parquet(media_pq_path)

    job_copy = tmp_path / "extract_lines.py"
    shutil.copyfile(
        os.path.join(repo, "ocular_spark/jobs/extract_lines.py"), job_copy
    )
    out_dir = tmp_path / "media_lines.parquet"
    env = {k: v for k, v in os.environ.items() if k != "PYTHONPATH"}
    env["PYSPARK_PYTHON"] = sys.executable
    r = subprocess.run(
        [
            spark_submit, "--master", "local[2]",
            "--conf", "spark.sql.shuffle.partitions=2",
            "--conf", "spark.ui.enabled=false",
            "--py-files", str(zpath), str(job_copy),
            "--media", str(media_pq_path), "--output", str(out_dir),
            "--em-restarts", "20",
        ],
        cwd=tmp_path, env=env, capture_output=True, text=True, timeout=600,
    )
    assert r.returncode == 0, (r.stdout[-500:], r.stderr[-2000:])
    out = (
        pq.read_table(out_dir).to_pandas().sort_values("media_ref")
        .reset_index(drop=True)
    )
    want = media.sort_values("media_ref").reset_index(drop=True)
    assert list(out["media_ref"]) == list(want["media_ref"])
    assert list(out["n_lines"]) == list(want["n_lines"])


def _interleaved_fixture(spark, sf_dir, out_path, n_docs=8):
    """Synthesize a tiny interleaved (doc_id, spans) parquet: per doc a
    flat boilerplate page, a media span, and an adversarial nested
    page (the north_rule input shape)."""
    from pyspark.sql import functions as F

    from ocular_spark.functions import html as H

    d = (
        spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
        .select(F.col("doc_id").cast("string").alias("doc_id"), "text")
        .orderBy("doc_id")
        .limit(n_docs)
    )
    spans = F.expr(
        "array("
        "named_struct('kind', 'text', 'text', "
        + H.wrap_boilerplate_spark()
        + ", 'media_ref', cast(null as string), 'offset', 0), "
        "named_struct('kind', 'media', 'text', cast(null as string),"
        " 'media_ref', concat('m-', doc_id), 'offset', 1), "
        "named_struct('kind', 'text', 'text', "
        + H.wrap_nested_spark()
        + ", 'media_ref', cast(null as string), 'offset', 2))"
    )
    d.select("doc_id", spans.alias("spans")).repartition(3, "doc_id") \
        .write.mode("overwrite").parquet(out_path)


def test_extract_content_job_resume_and_lineage(spark, sf_dir, tmp_path):
    """The resumable extraction job (north rule: 'resumable from
    checkpoint with per-partition lineage + metrics'): expr engine
    output matches the independent DOM python kernel span-for-span,
    media spans pass through, the snapshot carries per-doc lineage
    stats, --metrics aggregates them per input partition, and
    --resume-from + same --output appends exactly the missing docs."""
    import argparse

    from ocular_spark.functions.html import extract_main_content_dom
    from ocular_spark.jobs.extract_content import run
    from ocular_spark.pipeline import NoDocumentsToProcessError

    docs_path = str(tmp_path / "docs.parquet")
    _interleaved_fixture(spark, sf_dir, docs_path, n_docs=8)
    inp = pq.read_table(docs_path).to_pandas()
    all_ids = sorted(inp["doc_id"])

    def A(**kw):
        base = dict(docs=docs_path, output=None, metrics=None,
                    resume_from=None, fail_if_empty=False, engine="expr",
                    num_partitions=None, format="parquet")
        base.update(kw)
        return argparse.Namespace(**base)

    # ---- full run with metrics
    out1 = str(tmp_path / "out1.parquet")
    met1 = str(tmp_path / "met1.parquet")
    run(spark, A(output=out1, metrics=met1))
    snap = pq.read_table(out1).to_pandas().sort_values("doc_id").reset_index(drop=True)
    assert sorted(snap["doc_id"]) == all_ids

    want = inp.sort_values("doc_id").reset_index(drop=True)
    for spans_out, spans_in in zip(snap["spans"], want["spans"]):
        assert len(spans_out) == len(spans_in)
        for so, si in zip(spans_out, spans_in):
            assert (so["kind"], so["media_ref"], so["offset"]) == (
                si["kind"], si["media_ref"], si["offset"])
            if si["kind"] == "media":
                assert so["text"] is None  # pass-through untouched
            else:
                # independent implementation agreement (DOM python)
                assert so["text"] == extract_main_content_dom(si["text"])[2]

    # per-doc lineage stats are consistent
    for _, r in snap.iterrows():
        assert r["n_spans"] == 3 and r["n_text_spans"] == 2
        assert r["chars_in"] == sum(len(s["text"]) for s in
                                    want[want.doc_id == r.doc_id].iloc[0]["spans"]
                                    if s["text"] is not None)
        assert r["chars_out"] == sum(len(s["text"]) for s in r["spans"]
                                     if s["text"] is not None)
        assert 0 < r["chars_out"] < r["chars_in"]  # boilerplate dropped

    # metrics = per-partition rollup of the snapshot stats
    m = pq.read_table(met1).to_pandas()
    assert set(m.columns) == {"part_id", "n_docs", "n_spans",
                              "n_text_spans", "chars_in", "chars_out"}
    assert m["n_docs"].sum() == len(all_ids)
    assert m["chars_out"].sum() == snap["chars_out"].sum()
    assert set(m["part_id"]) == set(snap["part_id"])

    # ---- resume: seed with a 3-doc subset, then resume into it
    subset_path = str(tmp_path / "docs_subset.parquet")
    sub_ids = all_ids[:3]
    sdf = spark.read.parquet(docs_path)
    sdf.filter(sdf["doc_id"].isin(sub_ids)).write.mode("overwrite").parquet(subset_path)
    out2 = str(tmp_path / "out2.parquet")
    run(spark, A(docs=subset_path, output=out2))
    assert sorted(pq.read_table(out2).to_pandas()["doc_id"]) == sub_ids

    run(spark, A(output=out2, resume_from=out2))  # append the other 5
    snap2 = pq.read_table(out2).to_pandas()
    assert sorted(snap2["doc_id"]) == all_ids  # each exactly once

    # nothing left -> fail-if-empty raises
    with pytest.raises(NoDocumentsToProcessError):
        run(spark, A(output=str(tmp_path / "out3.parquet"),
                     resume_from=out2, fail_if_empty=True))

    # ---- DOM engine produces the identical snapshot (data columns)
    out4 = str(tmp_path / "out4.parquet")
    run(spark, A(output=out4, engine="dom"))
    snap4 = pq.read_table(out4).to_pandas().sort_values("doc_id").reset_index(drop=True)
    for a, b in zip(snap["spans"], snap4["spans"]):
        assert list(map(dict, a)) == list(map(dict, b))
    assert list(snap4["chars_out"]) == list(snap["chars_out"])


def test_extract_content_expr_plan_is_projection(spark, sf_dir, tmp_path):
    """The job's 100 TB hot path (expr engine) must stay ONE map-side
    JVM projection over the scan: no join, no sort,
    no aggregate, no Python eval, no exchange at all (the job never
    repartitions unless --num-partitions asks)."""
    from ocular_spark.jobs.extract_content import extract_expr

    docs_path = str(tmp_path / "docs.parquet")
    _interleaved_fixture(spark, sf_dir, docs_path, n_docs=4)
    df = extract_expr(spark.read.parquet(docs_path))
    plan = df._jdf.queryExecution().executedPlan().toString()
    for bad in ("Join", "Sort", "Window", "Aggregate", "Exchange",
                "ArrowEvalPython", "BatchEvalPython", "MapInPandas"):
        assert bad not in plan, bad
    # higher-order array exprs (transform/aggregate) are interpreted
    # JVM projections, not codegen'd — assert the shape, not codegen
    assert "Project" in plan and "Scan" in plan


def test_spark_submit_extract_content_launch(tmp_path, spark, sf_dir):
    """North-rule launch surface for the EXTRACTION pipeline itself:
    `spark-submit --py-files ocular_spark.zip extract_content.py` from
    outside the repo (zip is the only package source), resume flags +
    metrics included; output checked against the in-process DOM
    kernel."""
    import shutil
    import subprocess
    import sys
    import zipfile

    from ocular_spark.functions.html import extract_main_content_dom

    spark_submit = shutil.which("spark-submit")
    if spark_submit is None:
        pytest.skip("spark-submit not on PATH")

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    pkg = os.path.join(repo, "ocular_spark")
    zpath = tmp_path / "ocular_spark.zip"
    with zipfile.ZipFile(zpath, "w", zipfile.ZIP_DEFLATED) as z:
        for root, dirs, files in os.walk(pkg):
            dirs[:] = [d for d in dirs if d != "__pycache__"]
            for f in files:
                if f.endswith(".py"):
                    full = os.path.join(root, f)
                    z.write(full, os.path.relpath(full, repo))

    docs_path = str(tmp_path / "docs.parquet")
    _interleaved_fixture(spark, sf_dir, docs_path, n_docs=4)
    inp = pq.read_table(docs_path).to_pandas()

    job_copy = tmp_path / "extract_content.py"
    shutil.copyfile(
        os.path.join(repo, "ocular_spark/jobs/extract_content.py"), job_copy
    )
    out_dir = tmp_path / "extracted.parquet"
    met_dir = tmp_path / "metrics.parquet"
    env = {k: v for k, v in os.environ.items() if k != "PYTHONPATH"}
    env["PYSPARK_PYTHON"] = sys.executable
    r = subprocess.run(
        [
            spark_submit, "--master", "local[2]",
            "--conf", "spark.sql.shuffle.partitions=2",
            "--conf", "spark.ui.enabled=false",
            "--py-files", str(zpath), str(job_copy),
            "--docs", docs_path, "--output", str(out_dir),
            "--metrics", str(met_dir),
        ],
        cwd=tmp_path, env=env, capture_output=True, text=True, timeout=600,
    )
    assert r.returncode == 0, (r.stdout[-500:], r.stderr[-2000:])
    snap = pq.read_table(out_dir).to_pandas().sort_values("doc_id").reset_index(drop=True)
    want = inp.sort_values("doc_id").reset_index(drop=True)
    assert list(snap["doc_id"]) == list(want["doc_id"])
    for spans_out, spans_in in zip(snap["spans"], want["spans"]):
        for so, si in zip(spans_out, spans_in):
            if si["kind"] == "text":
                assert so["text"] == extract_main_content_dom(si["text"])[2]
            else:
                assert so["text"] is None
    m = pq.read_table(met_dir).to_pandas()
    assert m["n_docs"].sum() == len(want)
