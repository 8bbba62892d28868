"""Full engine-state checkpointing.

The reference checkpoints only the adapted proposal (the ``_mix.data``
file, logwrite.c:247-277) — chain state survives only in-process
(automix.c:90,145).  The engine checkpoints everything needed for exact
resumption: per-chain PRNG keys, chain state, proposal parameters, the
global sweep counter, and the host-side run statistics, so a run can be
killed and continued with identical trajectories (the fault-tolerance gap
called out in SURVEY.md section 5).

Format: a single ``.npz`` with a version tag + a flat array mapping.  A
reference-compatible ``_mix.data`` can always be derived via
``io.mixfile.write_mix_file``.
"""

from __future__ import annotations

import json
import os

import jax
import jax.numpy as jnp
import numpy as np

from automix_tpu.state import Chains, Proposal, RunStats

FORMAT_VERSION = 1

_CHAIN_FIELDS = ("key", "k", "theta", "logp", "pk", "pkllim", "nreinit",
                 "sweep")
_PROP_FIELDS = ("lam", "mu", "B", "logdetB", "nmix", "sig")
_STATS_SCALARS = ("naccrwmb", "ntryrwmb", "naccrwms", "ntryrwms", "nacctd",
                  "ntrytd", "nsweeps", "n_chains")
_STATS_ARRAYS = ("ksummary", "theta_sum", "theta_sqsum", "theta_count")


def save_checkpoint(path: str, sampler) -> None:
    """Serialize an AMSampler's resumable state to ``path`` (.npz)."""
    arrays = {}
    meta = {"version": FORMAT_VERSION, "seed": sampler.cfg.seed,
            "nmodels": sampler.modelset.nmodels,
            "dmax": sampler.modelset.dmax}
    if sampler.chains is not None:
        for f in _CHAIN_FIELDS:
            v = getattr(sampler.chains, f)
            if f == "key" and jax.dtypes.issubdtype(v.dtype,
                                                    jax.dtypes.prng_key):
                v = jax.random.key_data(v)
            arrays[f"chains.{f}"] = np.asarray(v)
    if sampler.proposal is not None:
        for f in _PROP_FIELDS:
            arrays[f"proposal.{f}"] = np.asarray(getattr(sampler.proposal, f))
    if sampler.stats is not None:
        st = sampler.stats
        for f in _STATS_ARRAYS:
            arrays[f"stats.{f}"] = getattr(st, f)
        meta["stats_scalars"] = {f: int(getattr(st, f))
                                 for f in _STATS_SCALARS}
    arrays["meta"] = np.frombuffer(
        json.dumps(meta).encode(), dtype=np.uint8)
    # Atomic write: a run killed mid-save (the periodic-checkpoint path must
    # survive SIGKILL at any instant) never leaves a truncated file at
    # ``path`` — the half-written temp is simply orphaned.
    tmp = f"{path}.tmp"
    with open(tmp, "wb") as fh:
        np.savez_compressed(fh, **arrays)
    os.replace(tmp, path)


def load_checkpoint(path: str, sampler) -> None:
    """Restore state saved by ``save_checkpoint`` into ``sampler`` in place.

    Validates the model-set shape against the checkpoint before touching
    any state (mirroring the C reader's consistency checks,
    logwrite.c:44-58).
    """
    z = np.load(path)
    meta = json.loads(bytes(z["meta"]).decode())
    if meta["version"] != FORMAT_VERSION:
        raise ValueError(f"checkpoint version {meta['version']} != "
                         f"{FORMAT_VERSION}")
    if meta["nmodels"] != sampler.modelset.nmodels \
            or meta["dmax"] != sampler.modelset.dmax:
        raise ValueError(
            f"checkpoint is for nmodels={meta['nmodels']} dmax={meta['dmax']}"
            f", sampler has nmodels={sampler.modelset.nmodels} "
            f"dmax={sampler.modelset.dmax}")
    dtype = sampler.cfg.dtype

    if "proposal.lam" in z:
        kw = {}
        for f in _PROP_FIELDS:
            v = jnp.asarray(z[f"proposal.{f}"])
            if v.dtype == jnp.float64:
                v = v.astype(dtype)
            kw[f] = v
        sampler.proposal = Proposal(**kw)
        sampler.cpstats.initialized = True

    if "chains.k" in z:
        kw = {}
        for f in _CHAIN_FIELDS:
            v = z[f"chains.{f}"]
            if f == "key":
                # Engine keys are legacy uint32 [S, 2] arrays (jax 0.9
                # default); stored verbatim.
                kw[f] = jnp.asarray(v, jnp.uint32)
            elif f in ("k", "nreinit", "sweep"):
                kw[f] = jnp.asarray(v, jnp.int32)
            else:
                kw[f] = jnp.asarray(v, dtype)
        sampler.chains = Chains(**kw)
        if sampler.mesh is not None:
            from automix_tpu.parallel import mesh as mesh_lib
            sampler.chains = mesh_lib.shard_chains(sampler.chains,
                                                   sampler.mesh)

    if "stats.ksummary" in z:
        st = RunStats(sampler.modelset.nmodels, sampler.modelset.dmax)
        for f in _STATS_ARRAYS:
            setattr(st, f, z[f"stats.{f}"])
        for f, v in meta.get("stats_scalars", {}).items():
            setattr(st, f, v)
        sampler.stats = st
