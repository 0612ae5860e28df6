"""Smoke-run the worked examples so they can't rot (they are the repo's
user-facing entry documentation)."""

from __future__ import annotations

import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _run(script: str) -> str:
    out = subprocess.run(
        [sys.executable, os.path.join(REPO, "examples", script),
         "/root/testdata/sf0.001"],
        capture_output=True,
        text=True,
        timeout=420,
        cwd=REPO,
    )
    assert out.returncode == 0, out.stderr[-2000:]
    return out.stdout


def test_analytics_demo_runs():
    stdout = _run("analytics_demo.py")
    assert "pricing summary" in stdout
    assert "loaded 10 tables" in stdout


def test_corpus_pipeline_demo_runs():
    stdout = _run("corpus_pipeline_demo.py")
    assert "cluster representatives" in stdout
    assert "nearest neighbors" in stdout
    assert "decontamination report (r12)" in stdout
    assert "trained quality filter (r12)" in stdout


def test_monitoring_demo_runs():
    stdout = _run("monitoring_demo.py")
    assert "rollup ladder" in stdout
    assert "monitoring surface demo complete" in stdout


def test_lakehouse_demo_runs():
    stdout = _run("lakehouse_demo.py")
    assert "partitioned write" in stdout
    assert "lakehouse demo complete" in stdout


def test_model_qa_demo_runs():
    stdout = _run("model_qa_demo.py")
    assert "one-vs-rest AUC" in stdout
    assert "model QA demo complete" in stdout
