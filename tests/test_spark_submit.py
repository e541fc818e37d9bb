"""North-rule invocation evidence: the flagship pipeline runs via
``spark-submit --py-files <pkg.zip>`` (the exact cluster submission shape —
only ``--master`` and the data paths change on a real cluster).

The subprocess runs from a neutral cwd so the driver cannot import
``geospatial_spark`` from the repo checkout — the package must arrive via
the ``--py-files`` zip, exactly as it would on a cluster's executors."""

from __future__ import annotations

import json
import os
import subprocess
import zipfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_spark_submit_pipeline(tmp_path):
    zpath = tmp_path / "geospatial_spark.zip"
    pkg = os.path.join(REPO, "geospatial_spark")
    with zipfile.ZipFile(zpath, "w") as z:
        for root, _, files in os.walk(pkg):
            if "__pycache__" in root:
                continue
            for f in files:
                if f.endswith(".pyc"):
                    continue
                full = os.path.join(root, f)
                z.write(full, os.path.relpath(full, REPO))

    out = tmp_path / "geo_out"
    cmd = [
        "spark-submit",
        "--master", "local[4]",
        "--py-files", str(zpath),
        "--conf", "spark.sql.shuffle.partitions=8",
        "--conf", "spark.ui.enabled=false",
        os.path.join(REPO, "run_pipeline.py"),
        "--sf-dir", "/root/testdata/sf0.001",
        "--out", str(out),
        "--partitions", "8",
    ]
    res = subprocess.run(
        cmd, capture_output=True, text=True, timeout=420, cwd=str(tmp_path)
    )
    assert res.returncode == 0, res.stderr[-3000:]
    # last stdout line is the manifest summary JSON
    summary = json.loads(res.stdout.strip().splitlines()[-1])
    assert summary["points"]["rows"] == 12000
    assert summary["joined"]["rows"] == 9803
    assert summary["points"]["partitions"] == 8
    # lineage manifests were committed to the icelite table's metadata dir
    meta = out / "points" / "metadata"
    assert (meta / "VERSION").exists()
    versions = sorted(p.name for p in meta.iterdir() if p.suffix == ".json")
    assert versions, "no committed manifest versions"
    manifest = json.loads((meta / versions[-1]).read_text())
    assert sum(p["row_count"] for p in manifest["partitions"]) == 12000
