"""CLI driver tests (flag surface mirrors main.c:114-143)."""

import os
import subprocess
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _run_cli(args, cwd):
    env = dict(os.environ)
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    env["JAX_PLATFORMS"] = "cpu"
    return subprocess.run(
        [sys.executable, "-m", "automix_tpu.cli"] + args,
        capture_output=True, text=True, cwd=cwd, env=env, timeout=900)


def test_cli_end_to_end_and_mode1_restart(tmp_path):
    """Full pipeline + mode-1 restart from the _mix.data checkpoint — the
    reference CI's smoke flow (.travis.yml:10-12)."""
    args = ["normal", "-N", "400", "-b", "100", "-n", "300", "-s", "5",
            "-f", "run", "--chains", "64", "--chains-stage1", "64",
            "--platform", "cpu"]
    r = _run_cli(args, str(tmp_path))
    assert r.returncode == 0, r.stderr[-2000:]
    assert "p(M=1|E) = 1.0" in r.stdout
    assert (tmp_path / "run_mix.data").exists()
    assert (tmp_path / "run_k.data").exists()
    # mode 1: resume stage 3 from the written mixture file
    r2 = _run_cli(["normal", "-m", "1", "-N", "300", "-b", "100", "-s", "6",
                   "-f", "run", "--chains", "64", "--platform", "cpu",
                   "--no-reports"], str(tmp_path))
    assert r2.returncode == 0, r2.stderr[-2000:]
    assert "Reading parameters from mix file." in r2.stdout


def test_cli_unknown_problem(tmp_path):
    r = _run_cli(["nonexistent_problem", "--platform", "cpu"], str(tmp_path))
    assert r.returncode != 0
    assert "unknown problem" in (r.stderr + r.stdout)
