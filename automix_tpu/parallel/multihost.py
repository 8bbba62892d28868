"""Multi-host (pod-slice) initialization helpers.

The reference has no distributed story at all (SURVEY.md section 2.3).
The engine's multi-host model is the standard JAX one: every host runs the
same program, ``jax.distributed.initialize`` wires the processes together,
and the global chain axis spans all hosts' devices.  Because chains only
interact through small adaptation statistics, the cross-host traffic is a
handful of scalar/`[K, D]`-sized reductions per chunk — ICI/DCN bandwidth
is never the constraint; the design scales to pod slices by construction.

Typical pod-slice driver::

    from automix_tpu.parallel import multihost, mesh
    multihost.initialize()                      # once per process
    m = mesh.make_global_mesh()                 # all devices, all hosts
    am = AMSampler(models, cfg, mesh=m)
    am.burn_samples(...)                        # identical on every host
    stats = am.rjmcmc_samples(...)              # stats identical everywhere

Every host computes identical chunk statistics (they are global
reductions), so rank-0-only reporting is a cosmetic choice, not a
correctness requirement.
"""

from __future__ import annotations

from typing import Optional

import jax
import numpy as np

from automix_tpu.parallel.mesh import CHAIN_AXIS


def initialize(coordinator_address: Optional[str] = None,
               num_processes: Optional[int] = None,
               process_id: Optional[int] = None) -> None:
    """Initialize jax.distributed (no-op if already initialized or if the
    environment provides the coordination config, e.g. on TPU pods)."""
    try:
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id)
    except RuntimeError as e:  # already initialized
        if "already" not in str(e).lower():
            raise


def make_global_mesh():
    """1-D mesh over every device of every host."""
    from jax.sharding import Mesh
    return Mesh(np.array(jax.devices()), (CHAIN_AXIS,))


def is_primary() -> bool:
    return jax.process_index() == 0
