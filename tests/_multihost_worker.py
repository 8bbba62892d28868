"""Worker process for the 2-process jax.distributed test.

Each of the two processes owns 4 virtual CPU devices; together they form
the 8-device global mesh.  The worker runs sharded stage 1 and a stage-3
chunk over the *global* chain axis and prints the (replicated) global
statistics as one JSON line — the parent test asserts both ranks printed
identical stats that match a single-process reference run bitwise.

Usage: python tests/_multihost_worker.py <process_id> <num_processes> <port>
"""

import json
import os
import sys


def main():
    pid, nproc, port = int(sys.argv[1]), int(sys.argv[2]), sys.argv[3]
    os.environ["JAX_PLATFORMS"] = "cpu"
    os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                               + " --xla_force_host_platform_device_count=4")
    import jax

    jax.config.update("jax_platforms", "cpu")

    from automix_tpu.parallel import multihost

    multihost.initialize(coordinator_address=f"localhost:{port}",
                         num_processes=nproc, process_id=pid)
    assert jax.process_count() == nproc
    assert len(jax.devices()) == 4 * nproc, jax.devices()

    import numpy as np

    from automix_tpu.config import EngineConfig
    from automix_tpu.kernels import rjmcmc, rwm
    from automix_tpu.models import builtin
    from automix_tpu.parallel import mesh as mesh_lib
    from automix_tpu.state import Proposal

    ms = builtin.normal_beta_set()
    cfg = EngineConfig(n_chains=64, n_chains_stage1=32, seed=0,
                       n_trace_chains=4)
    mesh = multihost.make_global_mesh()

    # stage 1 sharded across both hosts: integer-psum pooled adaptation
    sig, _, _ = rwm.run_stage1(ms, cfg, jax.random.PRNGKey(3), 100,
                               mesh=mesh)

    # stage 3 on a deterministic proposal (no EM, so the reference run in
    # the parent process is bitwise comparable)
    prop = Proposal.initial(ms.nmodels, 2, ms.dmax, dtype=cfg.dtype)
    prop = jax.tree.map(
        lambda x: jax.jit(lambda v: v,
                          out_shardings=mesh_lib.replicated(mesh))(x), prop)
    chains_spec = Chains_shardings(mesh)
    chains = jax.jit(lambda k: rjmcmc.init_chains(ms, cfg, k),
                     out_shardings=chains_spec)(jax.random.PRNGKey(4))
    runner = rjmcmc.build_chunk_runner(ms, cfg, burning=False,
                                       collect=True, mesh=mesh)
    chains, chunk = runner(chains, prop, 12)

    out = {
        "pid": pid,
        "sig": np.asarray(sig, np.float64).round(8).tolist(),
        "ksummary": np.asarray(chunk["ksummary"]).tolist(),
        "nacctd": int(chunk["nacctd"]),
        "naccrwms": int(chunk["naccrwms"]),
        "k_trace": np.asarray(chunk["k_trace"]).tolist(),
        "theta_sum": np.asarray(chunk["theta_sum"], np.float64).round(5).tolist(),
    }
    print("RESULT " + json.dumps(out, sort_keys=True))


def Chains_shardings(mesh):
    from jax.sharding import NamedSharding, PartitionSpec as P

    from automix_tpu.parallel.mesh import CHAIN_AXIS
    from automix_tpu.state import Chains

    chain = NamedSharding(mesh, P(CHAIN_AXIS))
    rep = NamedSharding(mesh, P())
    return Chains(key=chain, k=chain, theta=chain, logp=chain, pk=chain,
                  pkllim=chain, nreinit=chain, sweep=rep)


if __name__ == "__main__":
    main()
