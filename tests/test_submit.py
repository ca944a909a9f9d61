"""The north rule's deployment shape: `spark-submit --py-files
bloomspark.zip examples/terascale_build.py` must run the checkpointed
build + FPP validation + sharded save end to end — the library works as
a zipped dependency with no repo checkout on the executors' path."""

import json
import os
import shutil
import subprocess
import sys
import zipfile

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_spark_submit_py_files_job(tmp_path):
    spark_submit = shutil.which("spark-submit")
    if spark_submit is None:
        pytest.skip("spark-submit not on PATH")

    zip_path = tmp_path / "bloomspark.zip"
    with zipfile.ZipFile(zip_path, "w", zipfile.ZIP_DEFLATED) as zf:
        pkg = os.path.join(REPO, "bloomspark")
        for root, _dirs, files in os.walk(pkg):
            for f in files:
                if f.endswith(".py"):
                    full = os.path.join(root, f)
                    zf.write(full, os.path.relpath(full, REPO))

    ck = tmp_path / "ck"
    cmd = [
        spark_submit,
        "--master", "local[4]",
        "--conf", "spark.sql.shuffle.partitions=8",
        "--conf", "spark.ui.enabled=false",
        "--py-files", str(zip_path),
        os.path.join(REPO, "examples", "terascale_build.py"),
        "--input", "/root/testdata/sf0.001/lineitem.parquet",
        "--key", "l_orderkey",
        "--p", "0.01",
        "--checkpoint", str(ck),
        "--num-buckets", "8",
        "--sharded", "--counting", "--num-shards", "8",
        "--fpp-probes", "30000",
    ]
    env = dict(os.environ)
    # the job must resolve bloomspark from --py-files, NOT the repo cwd
    env.pop("PYTHONPATH", None)
    proc = subprocess.run(
        cmd, capture_output=True, text=True, timeout=540, cwd=str(tmp_path),
        env=env,
    )
    assert proc.returncode == 0, proc.stderr[-4000:]
    lines = [l for l in proc.stdout.splitlines() if l.startswith("{")]
    assert lines, proc.stdout[-2000:]
    report = json.loads(lines[-1])
    assert report["rows"] > 0
    assert report["observed_fpp"] <= 2 * 0.01
    assert report["buckets"] == 8
    assert report["sharded"]["num_shards"] == 8
    assert report["sharded_counting"]["num_shards"] == 8
    assert report["sharded_counting"]["estimated_population"] > 0
    # artifacts on disk: resumable checkpoint + durable filters of
    # both kinds, kind-tagged so they cannot be cross-loaded
    assert (ck / "lineage.json").exists()
    assert (ck / "sharded" / "config.json").exists()
    cc = json.load(open(ck / "sharded_counting" / "config.json"))
    assert cc["kind"] == "counting"


def test_training_pipeline_example_runs(tmp_path):
    """examples/training_pipeline.py end-to-end at sf0.001: every stage
    emits a JSON line and the summary reports a coherent packing."""
    import json
    import subprocess
    import sys

    proc = subprocess.run(
        [
            sys.executable,
            os.path.join(REPO, "examples", "training_pipeline.py"),
            "--input", "/root/testdata/sf0.001/documents.parquet",
            "--budget", "2048",
            "--cores", "2",
            "--out", str(tmp_path / "corpus"),
        ],
        capture_output=True,
        text=True,
        timeout=420,
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    lines = [
        json.loads(ln[ln.index("{"):])
        for ln in proc.stdout.splitlines()
        if "{" in ln and '"stage"' in ln or '"metric"' in ln
    ]
    stages = [l["stage"] for l in lines if "stage" in l]
    assert stages[:2] == ["read", "quality_gate"]
    summary = [l for l in lines if l.get("metric")][-1]
    assert summary["packs"] >= 1 and summary["avg_fill_tokens"] > 0
    assert (tmp_path / "corpus").exists()


def test_streaming_analytics_example_runs(tmp_path):
    """examples/streaming_analytics.py: all three streaming operators
    run end-to-end and land coherent outputs."""
    import json
    import subprocess
    import sys

    proc = subprocess.run(
        [
            sys.executable,
            os.path.join(REPO, "examples", "streaming_analytics.py"),
            "--events", "/root/testdata/sf0.001/events.parquet",
            "--out", str(tmp_path / "out"),
            "--cores", "2",
        ],
        capture_output=True,
        text=True,
        timeout=420,
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    ops = {}
    for ln in proc.stdout.splitlines():
        i = ln.find('{"op"')
        if i >= 0:
            d = json.loads(ln[i:])
            ops[d["op"]] = d
    assert set(ops) == {"windowed_distinct", "windowed_quantiles", "streaming_dedup"}
    assert ops["streaming_dedup"]["first_seen_rows"] == 15  # distinct users
    assert ops["windowed_distinct"]["rows"] >= 1
    assert (tmp_path / "out" / "windowed_quantiles").exists()
