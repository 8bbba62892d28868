"""Engine state pytrees.

The reference scatters state over four malloc'd structs with ragged arrays
(``chainState``/``proposalDist``/``condProbStats``/``runStats``,
automix.h:108-229, lifecycle automix.c:254-573).  Here all state is a small
set of fixed-shape arrays padded to ``dmax = max(model_dims)`` and
``lmax = NUM_MIX_COMPS_MAX`` so that chains in different models stay
vectorized — the layout SURVEY.md section 7 calls out as the design
inversion.

Padding conventions (see ops/linalg.py):

* ``theta``/``mu`` coordinates >= model dim are 0;
* ``B`` Cholesky factors carry an identity tail;
* dead mixture components have ``lam == 0`` (log-weight -inf masks them out
  of every categorical), ``mu == 0``, ``B == I``, ``logdetB == 0``.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct


@struct.dataclass
class Proposal:
    """Adapted proposal parameters — the engine's ``proposalDist``
    (automix.h:134-153), dense instead of ragged.

    Shapes: lam [K, L], mu [K, L, D], B [K, L, D, D], logdetB [K, L],
    nmix [K], sig [K, D].
    """

    lam: jnp.ndarray
    mu: jnp.ndarray
    B: jnp.ndarray
    logdetB: jnp.ndarray
    nmix: jnp.ndarray
    sig: jnp.ndarray

    @property
    def nmodels(self) -> int:
        return self.lam.shape[0]

    @property
    def lmax(self) -> int:
        return self.lam.shape[1]

    @property
    def dmax(self) -> int:
        return self.mu.shape[2]

    @classmethod
    def initial(cls, nmodels: int, lmax: int, dmax: int, dtype=jnp.float32):
        """Unfitted proposal: one standard-normal component per model and
        the stage-1 initial scale sig = 10.0 (automix.c:595)."""
        lam = jnp.zeros((nmodels, lmax), dtype).at[:, 0].set(1.0)
        mu = jnp.zeros((nmodels, lmax, dmax), dtype)
        B = jnp.broadcast_to(jnp.eye(dmax, dtype=dtype), (nmodels, lmax, dmax, dmax))
        logdetB = jnp.zeros((nmodels, lmax), dtype)
        nmix = jnp.ones((nmodels,), jnp.int32)
        sig = jnp.full((nmodels, dmax), 10.0, dtype)
        return cls(lam=lam, mu=mu, B=B, logdetB=logdetB, nmix=nmix, sig=sig)


@struct.dataclass
class Chains:
    """Batched MCMC chain state — ``chainState`` (automix.h:113-127) with a
    leading chain axis S.

    ``key`` is one PRNG key per chain (folded with the sweep counter each
    sweep); ``sweep`` is the global 1-based sweep counter shared by all
    chains, mirroring ``sweep_i`` (automix.c:90,145 — it keeps counting
    across burn/sample calls, which drives both the 1-in-10 block-RWM
    schedule and the diminishing-adaptation gain).
    """

    key: jnp.ndarray          # [S] PRNG keys
    k: jnp.ndarray            # [S] int32 current model index
    theta: jnp.ndarray        # [S, D] padded parameters
    logp: jnp.ndarray         # [S] current log-posterior
    pk: jnp.ndarray           # [S, K] adapted model-proposal probabilities
    pkllim: jnp.ndarray       # [S] re-init safeguard threshold (automix.c:446)
    nreinit: jnp.ndarray      # [S] int32 number of re-inits (automix.c:444)
    sweep: jnp.ndarray        # scalar int32 global sweep counter

    @property
    def n_chains(self) -> int:
        return self.k.shape[0]


class RunStats:
    """Host-side accumulated statistics of a stage-3 run — the engine's
    ``runStats`` (automix.h:179-207).

    Device chunks return int32/float32 partial sums; this object accumulates
    them in numpy int64/float64 so visit counters never overflow
    (S x nsweep easily exceeds 2^31).
    """

    def __init__(self, nmodels: int, dmax: int):
        self.nmodels = nmodels
        self.dmax = dmax
        self.ksummary = np.zeros(nmodels, np.int64)
        self.theta_sum = np.zeros((nmodels, dmax), np.float64)
        self.theta_sqsum = np.zeros((nmodels, dmax), np.float64)
        self.theta_count = np.zeros(nmodels, np.int64)
        self.naccrwmb = 0
        self.ntryrwmb = 0
        self.naccrwms = 0
        self.ntryrwms = 0
        self.nacctd = 0
        self.ntrytd = 0
        self.nsweeps = 0
        self.n_chains = 0
        # Sweeps between recorded trace entries (1 = every sweep; > 1 when
        # the fused engine records decimated boundary snapshots — see
        # config.trace_every).  Sokal tau computed on the thinned series
        # must be scaled by this to be in sweep units.
        self.trace_stride = 1
        # Per-sweep traces (lists of numpy chunks, concatenated on demand).
        self._k_trace = []       # [nsweep_chunk, n_trace] int8/int32
        self._pk_trace = []      # [nsweep_chunk, K] chain-0 pk
        self._logp_trace = []    # [nsweep_chunk] chain-0 logp
        self._theta_trace = []   # [nsweep_chunk, D] chain-0 theta
        self._k0_trace = []      # [nsweep_chunk] chain-0 model index
        self.timesecs_burn = 0.0
        self.timesecs_rjmcmc = 0.0
        self.timesecs_condprobs = 0.0

    # -- accumulation ----------------------------------------------------

    def absorb_chunk(self, chunk: dict):
        self.ksummary += np.asarray(chunk["ksummary"], np.int64)
        self.theta_sum += np.asarray(chunk["theta_sum"], np.float64)
        self.theta_sqsum += np.asarray(chunk["theta_sqsum"], np.float64)
        self.theta_count += np.asarray(chunk["ksummary"], np.int64)
        self.naccrwmb += int(chunk["naccrwmb"])
        self.ntryrwmb += int(chunk["ntryrwmb"])
        self.naccrwms += int(chunk["naccrwms"])
        self.ntryrwms += int(chunk["ntryrwms"])
        self.nacctd += int(chunk["nacctd"])
        self.ntrytd += int(chunk["ntrytd"])
        if "k_trace" in chunk:
            self._k_trace.append(np.asarray(chunk["k_trace"]))
        if "pk0_trace" in chunk:
            self._pk_trace.append(np.asarray(chunk["pk0_trace"], np.float64))
            self._logp_trace.append(np.asarray(chunk["logp0_trace"], np.float64))
            self._theta_trace.append(np.asarray(chunk["theta0_trace"], np.float64))
            self._k0_trace.append(np.asarray(chunk["k0_trace"]))

    # -- derived quantities ----------------------------------------------

    @property
    def model_probs(self) -> np.ndarray:
        """Posterior model probabilities: visit fractions, the quantity the
        reference reports as ksummary[i]/nsweep (logwrite.c:330-333)."""
        total = self.ksummary.sum()
        return self.ksummary / max(total, 1)

    def theta_mean(self) -> np.ndarray:
        """[K, D] per-model posterior means of theta."""
        cnt = np.maximum(self.theta_count, 1)[:, None]
        return self.theta_sum / cnt

    def theta_std(self) -> np.ndarray:
        """[K, D] per-model posterior standard deviations."""
        cnt = np.maximum(self.theta_count, 1)[:, None]
        mean = self.theta_sum / cnt
        var = np.maximum(self.theta_sqsum / cnt - mean ** 2, 0.0)
        return np.sqrt(var)

    @property
    def k_trace(self) -> Optional[np.ndarray]:
        """[nsweeps, n_trace_chains] model-index traces (for Sokal IACT)."""
        if not self._k_trace:
            return None
        return np.concatenate(self._k_trace, axis=0)

    @property
    def pk_trace(self) -> Optional[np.ndarray]:
        if not self._pk_trace:
            return None
        return np.concatenate(self._pk_trace, axis=0)

    @property
    def logp_trace(self) -> Optional[np.ndarray]:
        if not self._logp_trace:
            return None
        return np.concatenate(self._logp_trace, axis=0)

    @property
    def theta0_trace(self) -> Optional[np.ndarray]:
        if not self._theta_trace:
            return None
        return np.concatenate(self._theta_trace, axis=0)

    @property
    def k0_trace(self) -> Optional[np.ndarray]:
        if not self._k0_trace:
            return None
        return np.concatenate(self._k0_trace, axis=0)


class CondProbStats:
    """Host-side stage-1/2 telemetry — ``condProbStats`` (automix.h:160-172)."""

    def __init__(self):
        self.sig_trace = None        # [T, K, D] sig every 100 sweeps
        self.accept_trace = None     # [T, K, D] pooled acceptance ratio
        self.em_trace = None         # dict of [K, max_iters] arrays
        self.em_iters = None         # [K] iterations used
        self.timesecs_condprobs = 0.0
        self.timesecs_stage1 = 0.0   # adaptive RWM (incl. its compiles)
        self.timesecs_stage2 = 0.0   # EM mixture fit (incl. its compiles)
        self.initialized = False
