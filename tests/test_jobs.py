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
