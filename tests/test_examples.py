"""The examples must stay runnable — they are the repo's user-facing
composition documentation, and a silently-rotted example is worse than
none."""

from __future__ import annotations

import os
import subprocess
import sys

_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_llm_data_pipeline_example_runs_end_to_end():
    """ingest -> dedup -> quality -> buckets -> decontaminate -> pack,
    each stage a registered operator; the stage counts printed at the end
    prove every stage actually filtered/produced rows."""
    out = subprocess.run(
        [sys.executable,
         os.path.join(_ROOT, "examples", "llm_data_pipeline.py"),
         "/root/testdata/sf0.001"],
        capture_output=True, text=True, timeout=600, cwd=_ROOT,
    )
    assert out.returncode == 0, out.stderr[-3000:]
    line = [ln for ln in out.stdout.splitlines() if "bronze=" in ln][-1]
    parts = dict(
        kv.split("=") for kv in line.split() if "=" in kv and "root" not in kv
    )
    bronze, silver = int(parts["bronze"]), int(parts["silver"])
    assert bronze == 500
    assert 0 < silver < bronze      # dedup+quality really dropped docs
    assert int(parts["gold"]) > 0   # packing produced training rows


def test_corpus_monitor_example_runs(spark):
    """The monitoring composition must stay runnable and every section
    must emit its verdict line."""
    out = subprocess.run(
        [sys.executable,
         os.path.join(_ROOT, "examples", "corpus_monitor.py"),
         "/root/testdata/sf0.001"],
        capture_output=True, text=True, timeout=600, cwd=_ROOT,
    )
    assert out.returncode == 0, out.stderr[-3000:]
    for marker in ("[drift]", "[langid]", "[entropy]", "[pareto]",
                   "[seasonal]", "[embeddings]", "monitor_ok=1"):
        assert marker in out.stdout, out.stdout


def test_s3_standalone_example_runs_self_contained():
    """The no-args mode boots moto, uploads the reference Delta fixture
    to s3://ballista, and runs the golden query through the native S3
    client — the example must print the five golden names."""
    out = subprocess.run(
        [sys.executable, os.path.join(_ROOT, "examples", "s3_standalone.py")],
        capture_output=True, text=True, timeout=600, cwd=_ROOT,
    )
    assert out.returncode == 0, out.stderr[-3000:]
    for name in ("Bruce", "Ernesto", "Jack", "Soraya", "Wolfgang"):
        assert name in out.stdout, out.stdout[-2000:]
