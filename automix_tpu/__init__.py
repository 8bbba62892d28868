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

from automix_tpu.config import (
    AUTORJ_MIX_FIT,
    FIGUEIREDO_MIX_FIT,
    EngineConfig,
)
from automix_tpu.model import Model, ModelSet
from automix_tpu.sampler import AMSampler
from automix_tpu.state import Chains, Proposal, RunStats

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
