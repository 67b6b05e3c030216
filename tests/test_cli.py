"""CLI surface: python -m puddin_spark run/validate/stats (the reference's
script entry points, SURVEY.md section 3) driven as real subprocesses."""
from __future__ import annotations

import json
import subprocess
import sys

JSONL = "/root/reference/demo/data/pile/sample-1.jsonl"


def _run(args, cwd="/root/repo"):
    p = subprocess.run(
        [sys.executable, "-m", "puddin_spark", *args],
        capture_output=True, text=True, cwd=cwd, timeout=400,
    )
    last = p.stdout.strip().splitlines()[-1] if p.stdout.strip() else "{}"
    return p.returncode, json.loads(last)


def test_cli_run_validate_stats(tmp_path):
    dest = str(tmp_path / "out")
    code, out = _run(
        ["run", "-i", JSONL, "-d", dest, "--partitions", "2", "--master", "local[4]", "--conllu"]
    )
    assert code == 0
    assert out["new_docs"] == 12 and out["total_keep"] == 8  # golden sample-1

    # rerun: resume adds nothing
    code, out2 = _run(
        ["run", "-i", JSONL, "-d", dest, "--partitions", "2", "--master", "local[4]"]
    )
    assert code == 0 and out2 == {"snapshot_id": -1, "new_docs": 0}

    code, v = _run(
        ["validate", "-i", JSONL, "-d", dest, "--master", "local[4]"]
    )
    assert code == 0 and v["ok"] and v["n_verdicts"] == 12

    code, s = _run(["stats", "-d", dest, "--master", "local[4]"])
    assert code == 0
    langs = {r["lang"] for r in s}
    assert "ALL" in langs and "en" in langs


def test_cli_stats_without_store(tmp_path):
    code, out = _run(["stats", "-d", str(tmp_path / "nothing"), "--master", "local[4]"])
    assert code == 2 and "error" in out
