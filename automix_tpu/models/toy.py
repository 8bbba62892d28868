"""Toy examples: known Normal-mixture targets (thesis section 5.5.1).

Re-derivations of ``usertoy1.c`` (2 models whose conditional targets are
themselves Normal mixtures, with model priors 0.3/0.7 applied inside the
log-posterior, usertoy1.c:96-100) and ``usertoy2.c`` (5 models of dims
1..5, each a 2-component isotropic mixture with geometric model weights).
Because the targets are known mixtures, these exercise the EM proposal fit
against ground truth.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp
from jax.scipy.special import logsumexp

from automix_tpu.model import Model, ModelSet, memoized_set
from automix_tpu.ops import linalg

_LOG_2PI = 1.8378770664093453


def _mixture_logpdf(theta, weights, mus, Bs):
    """log sum_l w_l N(theta; mu_l, B_l B_l^T) for explicit lower-tri B_l.

    Matches the density the reference evaluates via forward substitution
    against the component's lower-triangular factor (usertoy1.c:79-95).
    """
    w = jnp.asarray(weights)
    mu = jnp.asarray(mus)                  # [L, d]
    B = jnp.asarray(Bs)                    # [L, d, d]
    d = mu.shape[-1]
    work = linalg.forward_substitute(B, theta[None, :] - mu)      # [L, d]
    quad = jnp.sum(work * work, axis=-1)
    logdet = jnp.sum(jnp.log(jnp.abs(jnp.diagonal(B, axis1=-2, axis2=-1))),
                     axis=-1)
    comp = jnp.log(w) - 0.5 * quad - 0.5 * d * _LOG_2PI - logdet
    return logsumexp(comp)


def _mixture_cols(weights, mus, Bs, log_prior):
    """Column form of ``_mixture_logpdf`` for the fused Pallas kernel
    (Model.logp_cols): unrolled forward substitution against each
    component's lower-triangular factor, logsumexp over components via
    chained ``logaddexp`` — all elementwise ops over the lane block."""
    w = np.asarray(weights, np.float64)
    mu = np.asarray(mus, np.float64)          # [L, d]
    B = np.asarray(Bs, np.float64)            # [L, d, d]
    L, d = mu.shape
    logdet = np.log(np.abs(np.diagonal(B, axis1=-2, axis2=-1))).sum(-1)
    const = np.log(w) - 0.5 * d * _LOG_2PI - logdet + log_prior

    def cols(rows):
        out = None
        for li in range(L):
            quad = 0.0
            work = []
            for i in range(d):
                resid = rows[i] - mu[li, i]
                for j in range(i):
                    resid = resid - B[li, i, j] * work[j]
                wi = resid * (1.0 / B[li, i, i])
                work.append(wi)
                quad = quad + wi * wi
            comp = const[li] - 0.5 * quad
            out = comp if out is None else jnp.logaddexp(out, comp)
        return out

    return cols


@memoized_set
def toy1_set(**kw) -> ModelSet:
    """usertoy1: model 0 is a 1-D 2-component mixture (prior 0.3), model 1
    a 2-D 3-component mixture with correlations (prior 0.7)
    (usertoy1.c:34-104)."""

    def logp_m0(theta):
        return _mixture_logpdf(
            theta,
            weights=[0.2, 0.8],
            mus=[[-3.0], [2.0]],
            Bs=[[[2.0]], [[1.0]]],
        ) + jnp.log(0.3)

    B1 = [
        [[2.0, 0.0], [0.0, 0.7071068]],
        [[1.414214, 0.0], [1.060660, 0.9354143]],
        [[1.414214, 0.0], [-1.060660, 0.9354143]],
    ]

    def logp_m1(theta):
        return _mixture_logpdf(
            theta,
            weights=[1 / 3, 1 / 3, 1 / 3],
            mus=[[0.0, 3.0], [-4.0, 1.0], [4.0, 1.0]],
            Bs=B1,
        ) + jnp.log(0.7)

    # loglik = the mixture density alone (the v1 contract's llh
    # out-parameter, user.h:19): logp minus the model-prior weight that
    # usertoy1.c:96-100 folds into the posterior.  Feeds the second
    # column of _lp.data (io/reports.py:_loglik_trace).
    return ModelSet([
        Model("toy1_k1", 1, logp_m0,
              loglik=lambda th: logp_m0(th) - jnp.log(0.3),
              logp_cols=_mixture_cols([0.2, 0.8], [[-3.0], [2.0]],
                                      [[[2.0]], [[1.0]]], np.log(0.3))),
        Model("toy1_k2", 2, logp_m1,
              loglik=lambda th: logp_m1(th) - jnp.log(0.7),
              logp_cols=_mixture_cols(
                  [1 / 3, 1 / 3, 1 / 3],
                  [[0.0, 3.0], [-4.0, 1.0], [4.0, 1.0]], B1, np.log(0.7))),
    ], **kw)


# Exact model posteriors for toy1: the per-model densities are normalized
# mixtures, so the evidence of model k IS its prior weight.
TOY1_MODEL_PROBS = np.array([0.3, 0.7])


@memoized_set
def toy2_set(**kw) -> ModelSet:
    """usertoy2: 5 models, model k of dim k+1, each a mixture
    0.3 N(+5*1, I) + 0.7 N(-5*1, 4I); model weights 1/2^(k+1) for k<4 and
    0.0625 for k=4 (usertoy2.c:34-80)."""
    models = []
    weights = [0.5, 0.25, 0.125, 0.0625, 0.0625]
    for k in range(5):
        d = k + 1

        def logp(theta, d=d, w_model=weights[k]):
            c1 = -0.5 * jnp.sum((theta - 5.0) ** 2) \
                - 0.5 * d * _LOG_2PI + jnp.log(0.3)
            c2 = -0.5 * jnp.sum((theta + 5.0) ** 2) / 4.0 \
                - 0.5 * d * _LOG_2PI - d * jnp.log(2.0) + jnp.log(0.7)
            return jnp.logaddexp(c1, c2) + jnp.log(w_model)

        def logp_cols(rows, d=d, w_model=weights[k]):
            q1 = 0.0
            q2 = 0.0
            for i in range(d):
                q1 = q1 + (rows[i] - 5.0) ** 2
                q2 = q2 + (rows[i] + 5.0) ** 2
            c1 = -0.5 * q1 - 0.5 * d * _LOG_2PI + float(np.log(0.3))
            c2 = -0.125 * q2 - 0.5 * d * _LOG_2PI \
                - d * float(np.log(2.0)) + float(np.log(0.7))
            return jnp.logaddexp(c1, c2) + float(np.log(w_model))

        models.append(Model(f"toy2_k{k + 1}", d, logp,
                            init=np.zeros(d),        # usertoy2.c:25-29
                            logp_cols=logp_cols))
    return ModelSet(models, **kw)


# Same normalization argument: exact posteriors = the model weights.
TOY2_MODEL_PROBS = np.array([0.5, 0.25, 0.125, 0.0625, 0.0625])
