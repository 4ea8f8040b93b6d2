"""spark-submit --py-files packaging: the zipped package plus the thin
driver script must run the full pipeline end-to-end in a fresh process
with the repo NOT on sys.path (north-rule deployment shape)."""

from __future__ import annotations

import json
import subprocess
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent


def test_pyfiles_zip_runs_pipeline(tmp_path):
    zip_path = tmp_path / "dist" / "er_spark.zip"
    out = subprocess.run(
        [sys.executable, str(REPO / "scripts" / "make_pyfiles.py"), str(tmp_path / "dist")],
        capture_output=True,
        text=True,
        timeout=60,
    )
    assert out.returncode == 0, out.stderr[-500:]
    assert zip_path.exists()

    # spark-submit from a NEUTRAL cwd so the package can only come from
    # --py-files; local[4] stands in for the cluster master URL
    run = subprocess.run(
        [
            "spark-submit",
            "--master", "local[4]",
            "--conf", "spark.sql.shuffle.partitions=8",
            "--py-files", str(zip_path),
            str(REPO / "scripts" / "submit_pipeline.py"),
            "--stage", "all",
            "--warehouse", str(tmp_path / "wh"),
            "--entities", "60",
        ],
        capture_output=True,
        text=True,
        timeout=420,
        cwd=str(tmp_path),
    )
    assert run.returncode == 0, run.stderr[-1500:]
    result_lines = [l for l in run.stdout.splitlines() if l.startswith("{")]
    assert result_lines, run.stdout[-800:]
    metrics = json.loads(result_lines[-1])
    assert metrics["f1"] == 1.0 and metrics["precision"] == 1.0
