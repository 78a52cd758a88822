"""End-to-end `spark-submit --py-files` smoke (north-rule deployment leg).

Zips the package, copies only the entry script into a neutral temp cwd,
and launches a REAL `spark-submit` subprocess — the only way the job can
import `textgraphs_spark` is through `--py-files`, so this catches
missing submodules in the zip, repo-relative imports, and cwd-dependent
paths that in-process tests can never see.
"""

import shutil
import subprocess
from pathlib import Path

import pytest

REPO = Path(__file__).resolve().parent.parent


@pytest.mark.skipif(
    shutil.which("spark-submit") is None, reason="spark-submit not on PATH"
)
def test_spark_submit_py_files_runs_er_job(tmp_path):
    shutil.make_archive(str(tmp_path / "tgs"), "zip", root_dir=REPO, base_dir="textgraphs_spark")
    shutil.copy(REPO / "tools" / "submit_er.py", tmp_path / "submit_er.py")
    proc = subprocess.run(
        [
            "spark-submit", "--master", "local[4]",
            "--py-files", str(tmp_path / "tgs.zip"),
            str(tmp_path / "submit_er.py"),
            "--synthetic", "120", "--workdir", str(tmp_path / "wd"),
        ],
        cwd=tmp_path, capture_output=True, text=True, timeout=420,
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    assert "clusters:" in proc.stdout, proc.stdout
    # stage checkpoints + lineage landed in the workdir
    assert (tmp_path / "wd" / "lineage").exists()
