"""jobs/run_rollup.py end-to-end: fresh process, own Ray session, resume."""

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _run(args):
    env = dict(os.environ, PYTHONPATH=REPO)
    return subprocess.run(
        [sys.executable, os.path.join(REPO, "jobs", "run_rollup.py"), *args],
        env=env, capture_output=True, text=True, timeout=240,
    )


def test_cli_job_and_resume(tmp_path):
    from wavelet_decomposition_ray import synth

    seq = synth.ensure_sequences("/root/testdata/sf0.001")
    out = str(tmp_path / "cli")
    r = _run(["--input", seq, "--out", out, "--buckets", "4",
              "--num-cpus", "4", "--tiers", "4"])
    assert r.returncode == 0, r.stderr[-2000:]
    summary = json.loads(r.stdout.strip().splitlines()[-1])
    assert summary["buckets_written"] == 4
    r2 = _run(["--input", seq, "--out", out, "--buckets", "4",
               "--num-cpus", "4", "--tiers", "4"])
    summary2 = json.loads(r2.stdout.strip().splitlines()[-1])
    assert summary2["buckets_skipped"] == 4
    assert summary2["buckets_written"] == 0


def test_cli_refresh_flag(tmp_path):
    from wavelet_decomposition_ray import synth

    seq = synth.ensure_sequences("/root/testdata/sf0.001")
    out = str(tmp_path / "cli_refresh")
    r = _run(["--input", seq, "--out", out, "--buckets", "4",
              "--num-cpus", "4", "--tiers", "4"])
    assert r.returncode == 0, r.stderr[-2000:]
    r2 = _run(["--input", seq, "--out", out, "--buckets", "4",
               "--num-cpus", "4", "--tiers", "4", "--refresh"])
    assert r2.returncode == 0, r2.stderr[-2000:]
    summary2 = json.loads(r2.stdout.strip().splitlines()[-1])
    assert summary2["buckets_refreshed"] == 0  # unchanged input
    assert summary2["buckets_written"] == 0


def test_cli_rejects_bad_bank():
    r = _run(["--input", "/x", "--out", "/tmp/never", "--bank", "nope"])
    assert r.returncode != 0
    assert "invalid choice" in r.stderr
