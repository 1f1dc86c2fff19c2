"""Real `spark-submit --py-files` launch proof (north rule: "run via
spark-submit --py-files on a multi-executor cluster"; README "Scale
path").

Everything else in the suite imports the package from the repo
checkout; this test proves the DISTRIBUTION story: the package zipped
into `naruhodo_spark.zip`, the entry script copied to a scratch
directory that does NOT contain the package, and the whole pipeline
launched through the real `/opt/spark/bin/spark-submit` binary — so
every import on the driver and on the Python workers must resolve from
the `--py-files` zip, exactly as on a multi-executor cluster where the
checkout does not exist on the executors.
"""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys
import zipfile

import pyarrow.dataset as pads
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SPARK_SUBMIT = shutil.which("spark-submit") or "/opt/spark/bin/spark-submit"


def _zip_package(dest: str) -> str:
    """Zip naruhodo_spark/ with the package dir as the zip root (the
    layout spark-submit adds to sys.path on driver and workers)."""
    zpath = os.path.join(dest, "naruhodo_spark.zip")
    pkg = os.path.join(REPO, "naruhodo_spark")
    with zipfile.ZipFile(zpath, "w", zipfile.ZIP_DEFLATED) as zf:
        for root, _dirs, files in os.walk(pkg):
            if "__pycache__" in root:
                continue
            for f in files:
                if f.endswith(".pyc"):
                    continue
                full = os.path.join(root, f)
                zf.write(full, os.path.relpath(full, REPO))
    return zpath


@pytest.mark.skipif(
    not os.path.exists(SPARK_SUBMIT), reason="spark-submit not installed"
)
def test_spark_submit_pyfiles_end_to_end(tmp_path):
    scratch = tmp_path / "scratch"
    scratch.mkdir()
    zpath = _zip_package(str(scratch))
    # Copy the entry script OUT of the repo so its sys.path.insert of
    # its own dirname cannot leak the checkout into the import path.
    entry = scratch / "build_kg.py"
    shutil.copyfile(os.path.join(REPO, "build_kg.py"), entry)
    out_dir = tmp_path / "kg_out"

    env = dict(os.environ)
    env.pop("PYTHONPATH", None)  # imports must come from --py-files
    env["PYSPARK_PYTHON"] = sys.executable
    env["PYSPARK_DRIVER_PYTHON"] = sys.executable

    proc = subprocess.run(
        [
            SPARK_SUBMIT,
            "--master",
            "local[4]",
            "--py-files",
            zpath,
            str(entry),
            "--n-docs",
            "80",
            "--out",
            str(out_dir),
            "--n-parts",
            "8",
        ],
        cwd=str(scratch),
        env=env,
        capture_output=True,
        text=True,
        timeout=600,
    )
    assert proc.returncode == 0, proc.stderr[-4000:]

    # the entry prints one JSON line of counters
    report = None
    for line in proc.stdout.splitlines():
        line = line.strip()
        if line.startswith("{"):
            report = json.loads(line)
    assert report is not None, proc.stdout
    assert report["docs"] == 80
    assert report["triples"] > 0

    # tables landed on disk; read back WITHOUT Spark (pyarrow) so this
    # check is independent of the session under test
    edges = pads.dataset(str(out_dir / "ksg_edges")).to_table()
    assert edges.num_rows > 0
    for col in ("subj", "obj", "weight"):
        assert col in edges.schema.names
    manifest = pads.dataset(str(out_dir / "_manifest")).to_table()
    assert manifest.num_rows > 0
