"""Two-process jax.distributed test (SURVEY.md section 2.3 multi-host row).

Spawns two worker processes, each owning 4 virtual CPU devices, wired
together with ``jax.distributed.initialize``; the workers run sharded
stage 1 and a stage-3 chunk over the 8-device *global* mesh and print the
global statistics.  Assertions:

* both ranks report identical global stats (they are psum-reduced, so a
  desynchronized collective or a rank-local computation would differ);
* the stats match a single-process 8-virtual-device reference run
  **bitwise** for the integer counters and adapted scales — the engine's
  contract that sharding (including across process boundaries) is a pure
  layout change.
"""

import json
import os
import socket
import subprocess
import sys

import jax
import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
WORKER = os.path.join(REPO, "tests", "_multihost_worker.py")


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


def _run_workers(nproc: int, timeout: int = 480):
    port = _free_port()
    env = dict(os.environ)
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    env.pop("XLA_FLAGS", None)  # worker sets its own device count
    procs = [
        subprocess.Popen(
            [sys.executable, WORKER, str(i), str(nproc), str(port)],
            stdout=subprocess.PIPE, stderr=subprocess.PIPE, env=env,
            cwd=REPO, text=True)
        for i in range(nproc)
    ]
    outs = []
    for p in procs:
        try:
            out, err = p.communicate(timeout=timeout)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        assert p.returncode == 0, f"worker failed:\n{err[-4000:]}"
        line = [ln for ln in out.splitlines() if ln.startswith("RESULT ")]
        assert line, f"no RESULT line:\n{out}\n{err[-2000:]}"
        outs.append(json.loads(line[-1][len("RESULT "):]))
    return outs


@pytest.mark.slow
def test_two_process_distributed_matches_single_process(eight_devices):
    r0, r1 = _run_workers(2)

    # both ranks computed identical global statistics
    for key in ("sig", "ksummary", "nacctd", "naccrwms", "k_trace",
                "theta_sum"):
        assert r0[key] == r1[key], key

    # reference: the same program in THIS process on 8 local devices
    from automix_tpu.config import EngineConfig
    from automix_tpu.kernels import rjmcmc, rwm
    from automix_tpu.models import builtin
    from automix_tpu.parallel import mesh as mesh_lib
    from automix_tpu.state import Proposal

    ms = builtin.normal_beta_set()
    cfg = EngineConfig(n_chains=64, n_chains_stage1=32, seed=0,
                       n_trace_chains=4)
    mesh = mesh_lib.make_mesh(8)
    sig, _, _ = rwm.run_stage1(ms, cfg, jax.random.PRNGKey(3), 100,
                               mesh=mesh)
    np.testing.assert_array_equal(
        np.asarray(sig, np.float64).round(8), np.asarray(r0["sig"]))

    prop = Proposal.initial(ms.nmodels, 2, ms.dmax, dtype=cfg.dtype)
    chains = mesh_lib.shard_chains(
        rjmcmc.init_chains(ms, cfg, jax.random.PRNGKey(4)), mesh)
    runner = rjmcmc.build_chunk_runner(ms, cfg, burning=False,
                                       collect=True, mesh=mesh)
    _, chunk = runner(chains, mesh_lib.replicate(prop, mesh), 12)
    assert np.asarray(chunk["ksummary"]).tolist() == r0["ksummary"]
    assert int(chunk["nacctd"]) == r0["nacctd"]
    assert np.asarray(chunk["k_trace"]).tolist() == r0["k_trace"]
    np.testing.assert_allclose(np.asarray(chunk["theta_sum"], np.float64),
                               np.asarray(r0["theta_sum"]), atol=1e-4)
