"""The real spark-submit --py-files path (north rule)."""

import json
import os
import shutil
import subprocess
import tempfile
import zipfile

import pytest

from tests.conftest import SF_DIR

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _zip_package(dest: str) -> str:
    zpath = os.path.join(dest, "s2spark.zip")
    with zipfile.ZipFile(zpath, "w") as z:
        for root, _dirs, files in os.walk(os.path.join(REPO, "s2spark")):
            for f in files:
                if f.endswith(".py"):
                    full = os.path.join(root, f)
                    z.write(full, os.path.relpath(full, REPO))
    return zpath


def test_spark_submit_tile_assign_resumes():
    d = tempfile.mkdtemp(prefix="s2spark_submit_")
    try:
        zpath = _zip_package(d)
        cmd = ["spark-submit", "--master", "local[4]",
               "--conf", "spark.ui.enabled=false",
               "--py-files", zpath,
               os.path.join(REPO, "jobs", "tile_assign.py"),
               "--input", f"{SF_DIR}/events.parquet",
               "--output", f"{d}/out", "--state-dir", f"{d}/state",
               "--job-id", "j1", "--levels", "4,8"]
        env = dict(os.environ, PYTHONPATH="")
        r1 = subprocess.run(cmd, capture_output=True, text=True,
                            timeout=420, env=env)
        assert r1.returncode == 0, r1.stderr[-2000:]
        assert "'failed': []" in r1.stdout

        # resume with the same job id: everything skipped
        r2 = subprocess.run(cmd, capture_output=True, text=True,
                            timeout=420, env=env)
        assert r2.returncode == 0, r2.stderr[-2000:]
        assert "'ran': []" in r2.stdout

        import duckdb
        n = duckdb.sql(
            f"SELECT count(*), count(DISTINCT event_id) "
            f"FROM '{d}/out/*/*.parquet'").fetchone()
        expect = duckdb.sql(
            f"SELECT count(*) FROM '{SF_DIR}/events.parquet'"
        ).fetchone()[0]
        assert n == (expect, expect)
        cols = [r[0] for r in duckdb.sql(
            f"DESCRIBE SELECT * FROM '{d}/out/*/*.parquet'").fetchall()]
        assert {"event_id", "cell_id", "tile_l4", "tile_l8"} <= set(cols)
    finally:
        shutil.rmtree(d, ignore_errors=True)


def test_spark_submit_dedup_corpus_resumes():
    d = tempfile.mkdtemp(prefix="s2spark_submit_")
    try:
        zpath = _zip_package(d)
        # corpus with planted duplicates: every document twice under
        # distinct ids (the second copy must lose to the lower id)
        import duckdb
        duckdb.sql(
            f"COPY (SELECT doc_id, text FROM "
            f"'{SF_DIR}/documents.parquet' UNION ALL "
            f"SELECT doc_id + 1000000, text FROM "
            f"'{SF_DIR}/documents.parquet') TO '{d}/in.parquet' "
            f"(FORMAT PARQUET)")
        cmd = ["spark-submit", "--master", "local[4]",
               "--conf", "spark.ui.enabled=false",
               "--py-files", zpath,
               os.path.join(REPO, "jobs", "dedup_corpus.py"),
               "--input", f"{d}/in.parquet",
               "--output", f"{d}/out", "--state-dir", f"{d}/state",
               "--job-id", "j1", "--n-buckets", "4"]
        env = dict(os.environ, PYTHONPATH="")
        r1 = subprocess.run(cmd, capture_output=True, text=True,
                            timeout=420, env=env)
        assert r1.returncode == 0, r1.stderr[-2000:]
        assert "'failed': []" in r1.stdout

        # resume with the same job id: everything skipped
        r2 = subprocess.run(cmd, capture_output=True, text=True,
                            timeout=420, env=env)
        assert r2.returncode == 0, r2.stderr[-2000:]
        assert "'ran': []" in r2.stdout

        n_docs = duckdb.sql(
            f"SELECT count(DISTINCT text) FROM "
            f"'{SF_DIR}/documents.parquet'").fetchone()[0]
        got, distinct_fp, max_id = duckdb.sql(
            f"SELECT count(*), count(DISTINCT fp), max(doc_id) "
            f"FROM '{d}/out/*/*.parquet'").fetchone()
        # one survivor per distinct text, keeping the LOWER doc_id
        assert got == n_docs == distinct_fp
        assert max_id < 1000000
    finally:
        shutil.rmtree(d, ignore_errors=True)
