"""Ship-via-``spark-submit --py-files`` smoke (north-rule packaging
requirement): the zip built by scripts/make_pyfiles.py must be the ONLY
way the submitted job sees the package — the test scrubs PYTHONPATH and
runs from a neutral cwd, so an import that silently leaked through the
checkout (instead of the shipped zip) fails loudly.

One subprocess builds a small index from the synthetic fixture corpus;
a second serves a BM25 query over it. Both go through the real
spark-submit launcher, the exact command BENCH/README document.
"""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys

import pytest

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

SPARK_SUBMIT = shutil.which("spark-submit") or os.path.join(
    os.path.dirname(os.path.dirname(shutil.which("python") or sys.executable)),
    "bin", "spark-submit")


def _find_spark_submit() -> str | None:
    if shutil.which("spark-submit"):
        return shutil.which("spark-submit")
    try:
        import pyspark
        cand = os.path.join(os.path.dirname(pyspark.__file__),
                            "bin", "spark-submit")
        if os.path.exists(cand):
            return cand
    except ImportError:
        pass
    return None


@pytest.mark.slow
def test_py_files_ship_build_and_query(tmp_path):
    submit = _find_spark_submit()
    if submit is None:
        pytest.skip("no spark-submit launcher on this host")
    zip_path = str(tmp_path / "quicker_spark.zip")
    out = subprocess.run(
        [sys.executable, os.path.join(ROOT, "scripts", "make_pyfiles.py"),
         zip_path], capture_output=True, text=True, check=True)
    assert os.path.exists(zip_path), out.stdout + out.stderr

    env = dict(os.environ)
    env.pop("PYTHONPATH", None)  # the zip must be the only package source
    idx = str(tmp_path / "idx")
    common = [submit, "--master", "local[4]", "--py-files", zip_path]
    run_dir = str(tmp_path)  # neutral cwd: no /root/repo on sys.path

    r = subprocess.run(
        common + [os.path.join(ROOT, "scripts", "build_index_cli.py"),
                  "--corpus", "fixtures:300", "--out", idx,
                  "--seg-docs", "100"],
        capture_output=True, text=True, env=env, cwd=run_dir, timeout=600)
    assert r.returncode == 0, r.stdout[-2000:] + r.stderr[-2000:]
    report = json.loads(r.stdout.strip().splitlines()[-1])
    assert report["n_docs"] == 300
    assert os.path.exists(os.path.join(idx, "stats.json"))

    r = subprocess.run(
        common + [os.path.join(ROOT, "scripts", "query_cli.py"),
                  "--index", idx, "--terms", "def,return", "--k", "5"],
        capture_output=True, text=True, env=env, cwd=run_dir, timeout=600)
    assert r.returncode == 0, r.stdout[-2000:] + r.stderr[-2000:]
    rows = [json.loads(line) for line in r.stdout.strip().splitlines()
            if line.startswith("{")]
    hits = [row for row in rows if "doc_id" in row]
    assert len(hits) == 5
    assert all(h["score"] > 0 for h in hits)
