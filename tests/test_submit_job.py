"""spark-submit --py-files smoke: the north-rule deployment surface.

Zips the package, launches ``jobs/dedup_job.py`` through the real
spark-submit binary in a fresh JVM (no fixture session), and checks the
job's outputs: marked/clusters/lineage tables written, summary JSON on
stdout, categories partition the corpus.
"""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys
import zipfile

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SPARK_SUBMIT = shutil.which("spark-submit") or "/opt/spark/bin/spark-submit"


@pytest.mark.skipif(
    not os.path.exists(SPARK_SUBMIT), reason="spark-submit not on this host"
)
def test_spark_submit_py_files(tmp_path):
    pkg_zip = tmp_path / "umi_dedup_spark.zip"
    pkg_root = os.path.join(REPO, "umi_dedup_spark")
    with zipfile.ZipFile(pkg_zip, "w") as zf:
        for root, _dirs, files in os.walk(pkg_root):
            for f in files:
                if f.endswith(".py"):
                    full = os.path.join(root, f)
                    zf.write(full, os.path.relpath(full, REPO))

    out_dir = tmp_path / "out"
    env = dict(os.environ, SPARK_GRAFT_CPUS="4")
    proc = subprocess.run(
        [
            SPARK_SUBMIT, "--master", "local[4]",
            "--py-files", str(pkg_zip),
            os.path.join(REPO, "jobs", "dedup_job.py"),
            "--input", "/root/testdata/sf0.001/documents.parquet",
            "--adapter", "documents",
            "--output", str(out_dir),
            "--shuffle-partitions", "8",
        ],
        capture_output=True, text=True, timeout=420, env=env,
    )
    assert proc.returncode == 0, proc.stderr[-2000:]

    for table in ("marked", "clusters", "lineage"):
        assert (out_dir / table / "_SUCCESS").exists(), table

    summary_line = [
        ln for ln in proc.stdout.splitlines() if ln.startswith('{"categories"')
    ]
    assert summary_line, proc.stdout[-2000:]
    summary = json.loads(summary_line[-1])
    assert sum(summary["categories"].values()) == summary["library"]["total"]
    assert summary["overflow_buckets"] == 0


if __name__ == "__main__":
    sys.exit(pytest.main([__file__, "-q"]))
