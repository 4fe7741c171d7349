"""Deployment packaging: the --py-files zip must be a self-sufficient
source of `building2osm_spark` (scripts/submit_scaling.py north-rule
launch path). spark-submit itself is exercised manually (BASELINE.md
records the runs); here we prove the zip resolves WITHOUT the repo on
sys.path — the property a real cluster's executors depend on."""

from __future__ import annotations

import subprocess
import sys
import zipfile


def test_zip_packages_whole_engine(tmp_path):
    sys.path.insert(0, "/root/repo/scripts")
    try:
        from submit_scaling import make_zip
    finally:
        sys.path.pop(0)
    zpath = make_zip(str(tmp_path / "pkg.zip"))
    names = set(zipfile.ZipFile(zpath).namelist())
    for mod in (
        "building2osm_spark/__init__.py",
        "building2osm_spark/geom.py",
        "building2osm_spark/operators/cover_join.py",
        "building2osm_spark/sources/fixtures.py",
    ):
        assert mod in names, f"{mod} missing from --py-files zip"


def test_zip_imports_without_repo(tmp_path):
    sys.path.insert(0, "/root/repo/scripts")
    try:
        from submit_scaling import make_zip
    finally:
        sys.path.pop(0)
    zpath = make_zip(str(tmp_path / "pkg.zip"))
    # fresh interpreter, cwd outside the repo, no PYTHONPATH: only the zip
    code = (
        "import sys; sys.path.insert(0, %r); "
        "from building2osm_spark import geom; "
        "print(round(geom.distance((10.0, 60.0), (10.001, 60.0)), 1))" % zpath
    )
    proc = subprocess.run(
        [sys.executable, "-c", code],
        capture_output=True,
        text=True,
        cwd="/tmp",
        env={"PATH": "/usr/bin:/bin"},
        timeout=120,
    )
    assert proc.returncode == 0, proc.stderr
    assert proc.stdout.strip() == "55.6"
