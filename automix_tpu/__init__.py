"""automix_tpu: a TPU-native automatic Reversible Jump MCMC engine.

A from-scratch JAX/XLA implementation of the capabilities of the AutoMix
sampler (David Hastie; reference C implementation surveyed in SURVEY.md):
joint sampling over a discrete model index and that model's continuous
parameters, with automatic construction of the trans-dimensional proposal
via (1) adaptive within-model random-walk Metropolis, (2) Figueiredo-Jain
component-annihilating EM mixture fitting, and (3) an adaptive
reversible-jump sampler — all vectorized over thousands of parallel chains
and shardable over TPU device meshes.
"""

import os as _os

import jax as _jax


def _enable_persistent_compilation_cache():
    """Point JAX at an on-disk compilation cache.

    The engine's stage-1/EM programs are expensive to compile (tens of
    seconds on TPU for large model families — rb9's stage-1 scan alone is
    ~48s) but identical across processes, so a persistent cache turns every
    run after the first into a pure-compute run.  The reference has no
    compilation step at all (ahead-of-time C, Makefile:46-47); this is the
    TPU-native equivalent of shipping a prebuilt library.

    Respects an existing user configuration (``JAX_COMPILATION_CACHE_DIR``)
    and can be disabled with ``AUTOMIX_NO_PERSISTENT_CACHE=1``.
    """
    if _os.environ.get("AUTOMIX_NO_PERSISTENT_CACHE") == "1":
        return
    if _os.environ.get("JAX_COMPILATION_CACHE_DIR"):
        return  # user already configured a cache location
    try:
        path = _os.path.expanduser("~/.cache/automix_tpu/jax")
        _os.makedirs(path, exist_ok=True)
        _jax.config.update("jax_compilation_cache_dir", path)
        # Cache aggressively: through a remote-backend tunnel even trivial
        # compiles cost ~0.3-0.4 s RPC latency each (and occasionally far
        # more), so fetching beats recompiling at almost any size.
        _jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.1)
    except Exception:  # pragma: no cover - cache setup is best-effort
        pass


_enable_persistent_compilation_cache()

from automix_tpu.config import (  # noqa: E402
    AUTORJ_MIX_FIT,
    FIGUEIREDO_MIX_FIT,
    EngineConfig,
)
from automix_tpu.model import Model, ModelSet  # noqa: E402
from automix_tpu.sampler import AMSampler  # noqa: E402
from automix_tpu.state import Chains, Proposal, RunStats  # noqa: E402

__version__ = "0.1.0"

__all__ = [
    "AMSampler",
    "AUTORJ_MIX_FIT",
    "Chains",
    "EngineConfig",
    "FIGUEIREDO_MIX_FIT",
    "Model",
    "ModelSet",
    "Proposal",
    "RunStats",
]
