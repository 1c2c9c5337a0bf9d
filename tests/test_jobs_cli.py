"""Ops-path test: the north rule mandates jobs run via
``spark-submit --py-files`` — exercise that exact flow end to end."""

import json
import os
import subprocess
import zipfile

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SPARK_SUBMIT = os.environ.get("SPARK_SUBMIT", "spark-submit")


def _make_pyfiles_zip(tmp_path) -> str:
    zip_path = str(tmp_path / "python_hll_spark.zip")
    pkg = os.path.join(REPO, "python_hll_spark")
    with zipfile.ZipFile(zip_path, "w") as zf:
        for root, _, files in os.walk(pkg):
            for f in files:
                if f.endswith(".py"):
                    full = os.path.join(root, f)
                    zf.write(full, os.path.relpath(full, REPO))
    return zip_path


@pytest.mark.slow
def test_spark_submit_build_ndv(tmp_path, spark):
    import shutil
    if shutil.which(SPARK_SUBMIT) is None:
        pytest.skip("spark-submit not on PATH")

    # small deterministic input written by the already-running session
    from python_hll_spark.sources.seqs import seqs_table
    inp = str(tmp_path / "seqs")
    seqs_table(spark, 200, partitions=4).write.parquet(inp)

    zip_path = _make_pyfiles_zip(tmp_path)
    out = str(tmp_path / "ndv_out")
    job = os.path.join(REPO, "python_hll_spark", "plans", "jobs.py")
    env = dict(os.environ)
    env.pop("PYSPARK_GATEWAY_PORT", None)
    env.pop("PYSPARK_GATEWAY_SECRET", None)
    res = subprocess.run(
        [SPARK_SUBMIT, "--master", "local[4]", "--py-files", zip_path, job,
         "build-ndv", "--input", inp, "--output", out,
         "--group-cols", "source", "--n-salts", "4"],
        capture_output=True, text=True, timeout=300, env=env, cwd=str(tmp_path))
    assert res.returncode == 0, res.stderr[-2000:]

    lines = [json.loads(l) for l in res.stdout.strip().splitlines() if l.startswith("{")]
    assert len(lines) == 5  # one per source
    for row in lines:
        assert row["ndv"] > 0


@pytest.mark.slow
def test_spark_submit_prepare_corpus(tmp_path, spark):
    import shutil
    if shutil.which(SPARK_SUBMIT) is None:
        pytest.skip("spark-submit not on PATH")

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    inp = str(tmp_path / "docs")
    docs.write.parquet(inp)
    ev = str(tmp_path / "eval")
    docs.where("doc_id % 25 = 0").selectExpr(
        "doc_id + 900000 AS doc_id", "text").write.parquet(ev)

    zip_path = _make_pyfiles_zip(tmp_path)
    out = str(tmp_path / "clean")
    job = os.path.join(REPO, "python_hll_spark", "plans", "jobs.py")
    env = dict(os.environ)
    env.pop("PYSPARK_GATEWAY_PORT", None)
    env.pop("PYSPARK_GATEWAY_SECRET", None)
    res = subprocess.run(
        [SPARK_SUBMIT, "--master", "local[4]", "--py-files", zip_path, job,
         "prepare-corpus", "--input", inp, "--output", out,
         "--eval-input", ev, "--min-quality", "0.0", "--redact-pii"],
        capture_output=True, text=True, timeout=300, env=env, cwd=str(tmp_path))
    assert res.returncode == 0, res.stderr[-2000:]
    final = json.loads(res.stdout.strip().splitlines()[-1])
    assert final["rows_out"] > 0
    assert "rows_after_decontamination" in res.stdout
    # decontaminated corpus has no doc whose content matches an eval doc
    got = spark.read.parquet(out)
    contaminated = {r["doc_id"] for r in docs.where("doc_id % 25 = 0").collect()}
    kept = {r["doc_id"] for r in got.select("doc_id").collect()}
    assert not (kept & contaminated)
