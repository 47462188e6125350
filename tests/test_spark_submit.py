"""North-rule packaging clause: the build runs via ``spark-submit
--py-files`` — exercised for real: package the library into a zip, then
drive build + search through actual spark-submit subprocesses from a
NEUTRAL cwd with the repo stripped from PYTHONPATH, so the zip is the
only way the package can resolve (driver AND executors)."""

import json
import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _spark_submit() -> str:
    import pyspark
    return os.path.join(os.path.dirname(pyspark.__file__), "bin",
                        "spark-submit")


def _run(args, cwd):
    env = {k: v for k, v in os.environ.items() if k != "PYTHONPATH"}
    env["PYSPARK_PYTHON"] = sys.executable
    env["PYSPARK_DRIVER_PYTHON"] = sys.executable
    return subprocess.run(args, cwd=cwd, env=env, capture_output=True,
                          text=True, timeout=420)


@pytest.fixture(scope="module")
def pyfiles_zip(tmp_path_factory):
    sys.path.insert(0, os.path.join(REPO, "scripts"))
    from package_pyfiles import build_zip
    return build_zip(str(tmp_path_factory.mktemp("dist") /
                         "tantivy_spark.zip"))


def test_spark_submit_build_and_search(pyfiles_zip, tmp_path):
    import pandas as pd

    # tiny corpus parquet written WITHOUT spark (the submit JVM is the
    # one under test)
    corpus = tmp_path / "pages.parquet"
    pd.DataFrame({
        "url": [f"https://x.test/{i}" for i in range(40)],
        "text": [f"data fast scan doc {i} " + "filler word " * (i % 5)
                 for i in range(40)],
    }).to_parquet(corpus)
    idx = str(tmp_path / "idx")

    sub = _spark_submit()
    out = _run([sub, "--master", "local[4]",
                "--conf", "spark.sql.shuffle.partitions=4",
                "--py-files", pyfiles_zip,
                os.path.join(REPO, "scripts", "build_index_submit.py"),
                str(corpus), idx, "--n-segments", "2"], cwd=str(tmp_path))
    assert out.returncode == 0, out.stderr[-2000:]
    metrics = json.loads(out.stdout.strip().splitlines()[-1])
    assert metrics["n_docs"] == 40 and metrics["n_segments"] == 2
    assert os.path.exists(os.path.join(idx, "meta.json"))

    out = _run([sub, "--master", "local[4]",
                "--conf", "spark.sql.shuffle.partitions=4",
                "--py-files", pyfiles_zip,
                os.path.join(REPO, "scripts", "search_submit.py"),
                idx, 'data AND fast', "--k", "5"], cwd=str(tmp_path))
    assert out.returncode == 0, out.stderr[-2000:]
    rows = [json.loads(line) for line in out.stdout.strip().splitlines()
            if line.startswith("{")]
    assert len(rows) == 5
    assert all(r["score"] > 0 for r in rows)
    assert rows[0]["rank"] == 1
