"""Device-mesh and sharding helpers for the chain axis.

The reference is strictly single-threaded, single-chain (one global chain
struct automix.h:113-127, global RNG automix.c:1297).  The engine's unit of
parallelism is the *chain axis*: chains are data-parallel and only interact
through small adaptation statistics, which jit turns into `psum`-style
collectives automatically once the chain axis is sharded.

Sharding layout:
* chain state (Chains pytree): leading axis sharded over the ``chains`` mesh
  axis; the scalar sweep counter replicated;
* proposal parameters (Proposal): replicated (small: K*L*D^2 floats);
* chunk statistics: reduced over the sharded axis -> replicated outputs.
"""

from __future__ import annotations

from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

CHAIN_AXIS = "chains"


def pvary(x, axis_name):
    """Mark a replicated value as varying over a shard_map axis (loop
    carries that start replicated but become chain-dependent).  No-op for
    axis_name=None or already-varying values; uses jax.lax.pcast on JAX
    versions where jax.lax.pvary is deprecated."""
    import jax

    if axis_name is None:
        return x
    vma = getattr(jax.typeof(x), "vma", frozenset())
    if axis_name in vma:
        return x
    if hasattr(jax.lax, "pcast"):
        return jax.lax.pcast(x, (axis_name,), to="varying")
    return jax.lax.pvary(x, (axis_name,))


def make_mesh(n_devices: Optional[int] = None) -> Mesh:
    """1-D mesh over all (or the first n) local devices."""
    devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    return Mesh(np.array(devices), (CHAIN_AXIS,))


def chain_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P(CHAIN_AXIS))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_chains(chains, mesh: Mesh):
    """Place a Chains pytree with the chain axis sharded over the mesh."""
    sharded = chain_sharding(mesh)
    repl = replicated(mesh)

    def place(x):
        if getattr(x, "ndim", 0) >= 1:
            return jax.device_put(x, sharded)
        return jax.device_put(x, repl)

    return jax.tree.map(place, chains)


def replicate(tree, mesh: Mesh):
    """Fully replicate a pytree (e.g. the Proposal) over the mesh."""
    repl = replicated(mesh)
    return jax.tree.map(lambda x: jax.device_put(x, repl), tree)
