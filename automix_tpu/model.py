"""Model registry: the engine's replacement for the C callback contract.

The reference receives the target as a C function pointer
``double (*targetDist)(int model_k, double *x)`` (automix.h:46) stored in
the sampler struct (automix.h:224) and invoked once per proposal evaluation
(automix.c:599,611,627,1062,1076,1238) — the single inversion of control in
the library.  The legacy v1 contract adds ``get_nmodels`` /
``load_model_dims`` / ``get_rwm_init`` (user.h:9-20).

Here a model is a pure JAX log-density; the registry pads all models to a
common ``dmax`` and builds a ``lax.switch``-dispatched log-posterior that
vectorizes over chains in different models (`vmap` of the switch evaluates
every branch on every chain and selects — the price of staying dense, cheap
for the reference's model counts K <= 15).

Because log-densities are pure JAX, gradients for the HMC/NUTS within-model
moves come for free via ``jax.grad``.
"""

from __future__ import annotations

import dataclasses
from typing import Callable, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from automix_tpu.config import NEG_INF


@dataclasses.dataclass(frozen=True)
class Model:
    """One model in the trans-dimensional union space.

    ``logp(theta) -> scalar`` is the log-posterior (up to an additive
    constant) of this model's continuous parameters; ``theta`` has shape
    ``[dim]``.  Any model prior weight must be folded into ``logp`` (as the
    reference examples do, e.g. usertoy1.c:96-100).

    ``init`` is the deterministic starting point for stage-1 RWM runs,
    mirroring ``initRWM``/``get_rwm_init`` (automix.c:211-229, user.h:16).
    If None, the engine draws uniform [0,1) starts like ``initAMSampler``
    does (automix.c:215-220).

    ``loglik`` optionally reports a likelihood component separately (the
    v1 contract's ``llh`` out-parameter, user.h:19); used only for the
    ``_lp.data``-style trace.

    ``logp_cols`` is an optional *column form* of ``logp`` used by the
    fused Pallas sweep kernel (kernels/fused.py), where chains live in
    vector lanes: it receives a sequence of per-coordinate arrays
    ``rows`` (``rows[i]`` holds coordinate i of every chain in the lane
    block, any broadcastable shape) and must return the log-posterior
    array elementwise — using only Mosaic-lowerable ops (no ``gammaln``;
    use ``ops.plmath.pal_gammaln``) and a finite ``config.NEG_INF``
    sentinel off-support.  Equivalence with ``logp`` is property-tested
    (tests/test_fused.py).
    """

    name: str
    dim: int
    logp: Callable
    init: Optional[np.ndarray] = None
    loglik: Optional[Callable] = None
    logp_cols: Optional[Callable] = None


def memoized_set(factory):
    """Memoize a ModelSet factory on its keyword arguments.

    Repeated construction of the same problem returns the SAME ModelSet
    object, so every id-keyed kernel cache and jit trace built against it
    is reused.  Without this, each ``AMSampler(tutorial_set(), ...)``
    builds a structurally identical but distinct ModelSet whose fused
    stage-1/stage-3 kernels re-trace and re-compile — tens of seconds of
    Mosaic compile per sampler on TPU (measured: rb9 re-adaptation 8.3 s
    keyed-miss vs 0.3 s run time).  ModelSets are immutable after
    construction, so sharing is safe.  Calls with positional or
    unhashable arguments fall through unmemoized."""
    import functools
    cache = {}

    @functools.wraps(factory)
    def wrapped(*args, **kw):
        if args:
            return factory(*args, **kw)
        key = tuple(sorted(kw.items(), key=lambda t: t[0]))
        try:
            hash(key)
        except TypeError:
            return factory(**kw)
        if key not in cache:
            cache[key] = factory(**kw)
        return cache[key]

    return wrapped


class ModelSet:
    """A fixed collection of models, padded to a common max dimension.

    ``batched_logpost`` optionally supplies a hand-vectorized kernel
    ``(k [S], theta_pad [S, dmax]) -> [S]`` used in place of the
    vmapped ``lax.switch``.  The switch evaluates *every* model's density
    for *every* chain and selects — fine for small K, wasteful for model
    families whose members share structure (e.g. the ten rb9 variants):
    a batched kernel computes each chain's own model directly via table
    lookups and runs K-times less work on the hot path.  The per-model
    ``logp`` functions remain the source of truth (gradients, SMC, tests);
    parity between the two paths is asserted in the test suite.
    """

    def __init__(self, models: Sequence[Model], dtype=jnp.float32,
                 batched_logpost=None, batched_logpost_cols=None,
                 fused_density=None):
        if not models:
            raise ValueError("need at least one model")
        self.models = tuple(models)
        self.dtype = dtype
        self.nmodels = len(models)
        self.dims = np.array([m.dim for m in models], dtype=np.int32)
        self.dmax = int(self.dims.max())
        self.dims_device = jnp.asarray(self.dims)
        self._batched_logpost = batched_logpost
        # Column form of ``batched_logpost`` for the fused Pallas engine:
        # ``(mks, rows) -> lp`` where ``mks`` is the list of K per-lane
        # 0/1 model masks and ``rows`` the dmax per-coordinate lane tiles.
        # Lets a model *family* sharing one formula (e.g. the ten rb9
        # variants) cost a single density evaluation in the fused sweep
        # instead of K mask-selected branches.
        self.batched_logpost_cols = batched_logpost_cols
        # Incremental column density for the fused engine (the
        # FusedColsDensity protocol, kernels/fused.py:make_density):
        # per-lane VMEM-cached sufficient statistics with cheap
        # single-coordinate updates — for matmul-heavy likelihoods like
        # DDI (models/ddi_cols.py).  Takes precedence over the stateless
        # column forms when present.
        self.fused_density = fused_density

    # -- construction helpers -------------------------------------------

    @classmethod
    def from_callback(cls, nmodels: int, model_dims: Sequence[int], logpost,
                      init=None, dtype=jnp.float32, name: str = "model"):
        """Build from a C-style single callback ``logpost(k, theta)``.

        ``logpost`` must be JAX-traceable for each *static* k; ``theta`` is
        the true-dimension slice.  ``init`` is the flat concatenated init
        vector exactly as ``initAMSampler`` consumes it (automix.c:222-228).
        """
        inits = [None] * nmodels
        if init is not None:
            flat = np.asarray(init, dtype=np.float64)
            off = 0
            inits = []
            for d in model_dims:
                inits.append(flat[off:off + d].copy())
                off += d
        models = [
            Model(name=f"{name}{k}", dim=int(model_dims[k]),
                  logp=(lambda th, k=k: logpost(k, th)), init=inits[k])
            for k in range(nmodels)
        ]
        return cls(models, dtype=dtype)

    # -- padded evaluation ----------------------------------------------

    def _branch(self, k: int):
        m = self.models[k]

        def branch(theta_pad):
            lp = m.logp(theta_pad[: m.dim])
            lp = jnp.asarray(lp, self.dtype)
            # Sanitize non-finite values (reference models return -DBL_MAX /
            # large negative sentinels for out-of-support states, e.g.
            # usercpt.c:96, userrb9.c:82); NaNs would poison the MH ratio.
            return jnp.where(jnp.isfinite(lp), lp, jnp.asarray(NEG_INF, self.dtype))

        return branch

    def logpost_padded(self, k, theta_pad):
        """Scalar log-posterior at padded theta for traced model index k."""
        branches = [self._branch(i) for i in range(self.nmodels)]
        if self.nmodels == 1:
            return branches[0](theta_pad)
        return jax.lax.switch(k, branches, theta_pad)

    def logpost_batch(self, k, theta_pad):
        """Batched log-posterior: k [S], theta_pad [S, dmax] -> [S].

        The generic path evaluates every model's density on the whole batch
        and combines with ``lax.select_n`` — the same select-all-branches
        work a ``vmap`` of the ``lax.switch`` lowers to, but without the
        cond primitive, which keeps the batch free of per-branch control
        flow under ``shard_map``/``vmap`` nesting (the switch's invariant
        branch-closure constants fail VMA unification against varying
        operands there).  ``select_n`` — unlike the stack + one-hot
        contraction it replaced — fuses into the producers on TPU; the
        one-hot reduction halved tutorial-target sweep throughput."""
        if self._batched_logpost is not None:
            lp = jnp.asarray(self._batched_logpost(k, theta_pad), self.dtype)
            return jnp.where(jnp.isfinite(lp), lp,
                             jnp.asarray(NEG_INF, self.dtype))
        if self.nmodels == 1:
            return jax.vmap(self._branch(0))(theta_pad)
        lps = [jax.vmap(self._branch(i))(theta_pad)
               for i in range(self.nmodels)]
        return jax.lax.select_n(k, *lps)

    def init_points(self, key) -> jnp.ndarray:
        """[K, dmax] padded stage-1 start points (uniform draws where a
        model provides none, mirroring automix.c:215-220)."""
        out = np.zeros((self.nmodels, self.dmax), dtype=np.float64)
        need_random = []
        for i, m in enumerate(self.models):
            if m.init is not None:
                arr = np.asarray(m.init, dtype=np.float64).reshape(-1)
                if arr.shape[0] != m.dim:
                    raise ValueError(
                        f"model {m.name}: init has length {arr.shape[0]}, expected {m.dim}")
                out[i, : m.dim] = arr
            else:
                need_random.append(i)
        result = jnp.asarray(out, self.dtype)
        for i in need_random:
            m = self.models[i]
            sub = jax.random.fold_in(key, i)
            u = jax.random.uniform(sub, (m.dim,), dtype=self.dtype)
            result = result.at[i, : m.dim].set(u)
        return result
