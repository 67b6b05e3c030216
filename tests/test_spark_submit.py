"""The north rule's launch surface, executed for real: `spark-submit
--py-files puddin_spark.zip` (BASELINE.json north_rule; README "Cluster
launch"). The job runs from a scratch cwd with the repo stripped from
PYTHONPATH, so every `puddin_spark` import in the driver AND the Python
workers must resolve from the shipped zip — exactly what a multi-executor
cluster sees. The same command re-run proves snapshot resume through the
submit surface (second run commits nothing new).
"""
from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys
import zipfile
from pathlib import Path

import pytest

REPO = Path(__file__).resolve().parent.parent

pytestmark = pytest.mark.skipif(
    shutil.which("spark-submit") is None, reason="spark-submit not on PATH"
)


def _build_zip(dest: Path) -> Path:
    zpath = dest / "puddin_spark.zip"
    with zipfile.ZipFile(zpath, "w", zipfile.ZIP_DEFLATED) as z:
        for p in sorted((REPO / "puddin_spark").rglob("*.py")):
            z.write(p, p.relative_to(REPO))
    return zpath


def _write_pages(dest: Path, n: int = 150) -> Path:
    import pyarrow as pa
    import pyarrow.parquet as pq

    from puddin_spark.synth import gen_rows

    # fixtures excluded: the golden corpus lives under tests/, which is
    # (deliberately) not shipped in the zip
    pdf = gen_rows(0, n, include_fixtures=False)
    tab = pa.Table.from_pandas(pdf, preserve_index=False)
    # pandas gives ns-precision timestamps; Spark's parquet reader wants us
    ix = tab.schema.get_field_index("warc_ts")
    tab = tab.set_column(
        ix, "warc_ts", tab["warc_ts"].cast(pa.timestamp("us", tz="UTC"))
    )
    path = dest / "pages.parquet"
    pq.write_table(tab, path)
    return path


def _submit(cwd: Path, zpath: Path, argv: list[str]) -> dict:
    env = {k: v for k, v in os.environ.items() if k != "PYTHONPATH"}
    env["PYSPARK_PYTHON"] = sys.executable
    env["PYSPARK_DRIVER_PYTHON"] = sys.executable
    proc = subprocess.run(
        [
            "spark-submit",
            "--master", "local[2]",
            "--conf", "spark.sql.shuffle.partitions=8",
            "--py-files", str(zpath),
            str(cwd / "job.py"),
            *argv,
        ],
        cwd=cwd,
        env=env,
        capture_output=True,
        text=True,
        timeout=420,
    )
    assert proc.returncode == 0, proc.stderr[-4000:]
    out_lines = [l for l in proc.stdout.splitlines() if l.startswith("{")]
    assert out_lines, f"no JSON line in stdout: {proc.stdout[-2000:]}"
    return json.loads(out_lines[-1])


def test_spark_submit_py_files_run_and_resume(tmp_path):
    zpath = _build_zip(tmp_path)
    pages = _write_pages(tmp_path)
    # the driver script is the shipped CLI module itself, copied out of the
    # repo tree so it cannot see the package except through --py-files
    shutil.copy(REPO / "puddin_spark" / "__main__.py", tmp_path / "job.py")
    dest = tmp_path / "out"

    run_argv = ["run", "-i", str(pages), "-d", str(dest), "--partitions", "8"]
    out = _submit(tmp_path, zpath, run_argv)
    assert out["snapshot_id"] == 0 and out["new_docs"] > 0
    assert 0 < out["total_keep"] < out["total_docs"]
    assert (dest / "verdicts").is_dir() and (dest / "lineage").is_dir()

    # same command again = resume: anti-join against the committed snapshot
    # finds nothing new, and the committed corpus is unchanged
    out2 = _submit(tmp_path, zpath, run_argv)
    assert out2["snapshot_id"] == -1 and out2["new_docs"] == 0

    # the validate job over the same store, through the same surface
    out3 = _submit(
        tmp_path, zpath, ["validate", "-i", str(pages), "-d", str(dest)]
    )
    assert out3["ok"] is True, out3


def test_spark_submit_local_cluster_real_executors(tmp_path):
    """The north rule's cluster shape with REAL separate executor JVMs:
    `spark-submit --master local-cluster[2,2,1024] --py-files ...` from a
    scratch cwd. Unlike local[N] (threads in the driver JVM), local-cluster
    spawns worker processes — the shipped zip must reach executor Python
    workers over the files channel, shuffles cross process boundaries, and
    closure serialization is exercised for real. The committed outcome must
    match the in-thread run bit-for-bit (same keep/drop counts)."""
    zpath = _build_zip(tmp_path)
    pages = _write_pages(tmp_path)
    shutil.copy(REPO / "puddin_spark" / "__main__.py", tmp_path / "job.py")

    def submit_master(master: str, dest: Path) -> dict:
        env = {k: v for k, v in os.environ.items() if k != "PYTHONPATH"}
        env["PYSPARK_PYTHON"] = sys.executable
        env["PYSPARK_DRIVER_PYTHON"] = sys.executable
        env.setdefault(
            "SPARK_HOME", str(Path(__import__("pyspark").__file__).parent)
        )
        proc = subprocess.run(
            [
                "spark-submit",
                "--master", master,
                "--conf", "spark.sql.shuffle.partitions=8",
                "--conf", "spark.executor.memory=900m",
                "--py-files", str(zpath),
                str(tmp_path / "job.py"),
                "run", "-i", str(pages), "-d", str(dest), "--partitions", "8",
            ],
            cwd=tmp_path,
            env=env,
            capture_output=True,
            text=True,
            timeout=420,
        )
        assert proc.returncode == 0, proc.stderr[-4000:]
        lines = [l for l in proc.stdout.splitlines() if l.startswith("{")]
        assert lines, f"no JSON line in stdout: {proc.stdout[-2000:]}"
        return json.loads(lines[-1])

    cluster = submit_master("local-cluster[2,2,1024]", tmp_path / "out_lc")
    threads = submit_master("local[4]", tmp_path / "out_th")
    assert cluster["new_docs"] > 0
    assert (
        cluster["total_docs"],
        cluster["total_keep"],
    ) == (threads["total_docs"], threads["total_keep"])
