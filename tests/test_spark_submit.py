"""north_rule launch contract: the engine runs via
``spark-submit --py-files mediacrawler_spark.zip scripts/run_crawl.py``.

The test zips the package, then launches spark-submit from a FOREIGN
working directory (the repo is not importable from cwd), so the package
must genuinely arrive via --py-files on both driver and executors
(the canonicalize/bloom pandas UDFs run executor-side)."""

import json
import os
import shutil
import subprocess
import zipfile
from pathlib import Path

import pytest

REPO = Path(__file__).resolve().parent.parent


def _zip_package(dest: Path) -> Path:
    zpath = dest / "mediacrawler_spark.zip"
    pkg = REPO / "mediacrawler_spark"
    with zipfile.ZipFile(zpath, "w") as z:
        for p in pkg.rglob("*.py"):
            z.write(p, p.relative_to(REPO))
    return zpath


def test_spark_submit_py_files_crawl(tmp_path):
    spark_submit = shutil.which("spark-submit")
    if spark_submit is None:
        pytest.skip("spark-submit not on PATH")
    zpath = _zip_package(tmp_path)
    catalog = tmp_path / "catalog"
    env = {k: v for k, v in os.environ.items() if k != "PYTHONPATH"}
    proc = subprocess.run(
        [
            spark_submit,
            "--master", "local[4]",
            "--conf", "spark.sql.shuffle.partitions=4",
            "--conf", "spark.ui.enabled=false",
            "--py-files", str(zpath),
            str(REPO / "scripts" / "run_crawl.py"),
            "--catalog", str(catalog),
            "--notes", "12", "--hosts", "3", "--max-epochs", "40",
        ],
        cwd=str(tmp_path),  # foreign cwd: package must come from --py-files
        env=env,
        capture_output=True,
        text=True,
        timeout=500,
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    stats = json.loads(proc.stdout.strip().splitlines()[-1])
    assert stats["fetched"] > 0 and stats["documents"] > 0
    assert stats["fsck_problems"] == []
    assert (catalog / "_commits.jsonl").exists()
