"""Masked small-matrix linear algebra for padded model dimensions.

The reference works with ragged per-model buffers and hand-rolled kernels:
in-place Cholesky (``automix.c:1682-1701``), determinant as the product of
the Cholesky diagonal (``automix.c:1752-1761``), and a multivariate-normal
log-pdf evaluated via forward substitution (``automix.c:1727-1750``).

Here every model's parameter vector lives in a buffer padded to
``Dmax = max(model_dims)``.  The padding convention, used engine-wide:

* vectors (theta, mu, work): coordinates ``>= dim`` are 0;
* matrices (covariances, Cholesky factors B): rows/cols ``>= dim`` form an
  identity block, zero elsewhere.

With that convention all kernels below operate on the full padded shapes
with no data-dependent control flow, so they vectorize over chains and
mixture components and compile to static-shape XLA.  The identity tail makes
``chol``/``det``/triangular solves exact on the padded shapes: the padded
rows solve to 0 and contribute 0 to log-determinants.

Model dims here are <= 16 (largest reference model: userddi.c, dim 16), far
below MXU tile size; the solves are unrolled over rows into vectorized
elementwise ops, which XLA fuses, rather than calling batched
``triangular_solve`` (tuned for large matrices).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

_LOG_2PI = 1.8378770664093453


def dim_mask(dim, dmax: int, dtype=jnp.float32):
    """[dmax] mask vector: 1.0 for coordinates < dim, else 0.0."""
    return (jnp.arange(dmax) < dim).astype(dtype)


def pad_vector(x, dim, dmax: int):
    """Zero coordinates >= dim of the trailing axis."""
    return x * dim_mask(dim, dmax, x.dtype)


def pad_cov_identity(cov, dim):
    """Overwrite rows/cols >= dim of a [.., D, D] matrix with identity.

    This is the engine's padding convention for covariance/Cholesky inputs;
    it keeps ``chol`` well-posed and makes determinants over the padded
    shape equal to determinants over the true ``dim`` leading block.
    """
    d = cov.shape[-1]
    i = jnp.arange(d)
    in_i = (i < dim)
    keep = in_i[..., :, None] & in_i[..., None, :]
    eye = jnp.eye(d, dtype=cov.dtype)
    return jnp.where(keep, cov, eye)


def chol(cov, dim=None, jitter: float = 0.0):
    """Lower-triangular Cholesky of a padded covariance.

    Equivalent of the reference's in-place ``chol`` (automix.c:1682-1701),
    batched.  If ``dim`` is given the input is first identity-padded beyond
    ``dim``.  ``jitter`` (relative to the mean diagonal) guards float32
    factorizations of near-singular sample covariances, a failure the
    double-precision reference mostly dodges.
    """
    d = cov.shape[-1]
    if dim is not None:
        cov = pad_cov_identity(cov, dim)
    if jitter:
        diag_mean = jnp.trace(cov, axis1=-2, axis2=-1) / d
        cov = cov + (jitter * diag_mean)[..., None, None] * jnp.eye(d, dtype=cov.dtype)
    return jnp.linalg.cholesky(cov)


def forward_substitute(B, y):
    """Solve ``B w = y`` with B [.., D, D] lower triangular, y [.., D].

    Mirrors the standardization step of the RJ move (automix.c:1125-1135)
    and the inner solve of ``lnormprob`` (automix.c:1738-1743).  Unrolled
    over rows (D is small and static); each step is a batched FMA.
    """
    d = y.shape[-1]
    w = []
    for i in range(d):
        s = y[..., i]
        for j in range(i):
            s = s - B[..., i, j] * w[j]
        w.append(s / B[..., i, i])
    return jnp.stack(w, axis=-1)


def lower_matvec(B, w):
    """``B @ w`` for lower-triangular B: the de-standardization step
    (automix.c:1206-1211)."""
    return jnp.einsum("...ij,...j->...i", jnp.tril(B), w)


def log_det_tri(B, dim=None):
    """log |det B| for lower-triangular B, summed over the true dims.

    Replaces ``log(det(...))`` of the reference (automix.c:1244-1245,
    1752-1761) with a log-scale computation that cannot underflow.
    """
    diag = jnp.diagonal(B, axis1=-2, axis2=-1)
    logd = jnp.log(jnp.abs(diag))
    if dim is not None:
        d = B.shape[-1]
        mask = jnp.arange(d) < jnp.asarray(dim)[..., None]
        logd = logd * mask.astype(logd.dtype)
    return jnp.sum(logd, axis=-1)


def lnormprob(x, mu, B, dim):
    """Log-pdf of N(mu, B B^T) at x, on padded shapes (automix.c:1727-1750).

    ``x``/``mu``: [.., D]; ``B``: [.., D, D] lower-triangular with identity
    tail; ``dim``: true dimension (broadcastable scalar/array).  Padded
    coordinates contribute nothing provided the padding convention holds.
    """
    d = x.shape[-1]
    w = forward_substitute(B, x - mu)
    mask = (jnp.arange(d) < jnp.asarray(dim)[..., None]).astype(x.dtype)
    quad = jnp.sum(w * w * mask, axis=-1)
    dimf = jnp.asarray(dim).astype(x.dtype)
    return -0.5 * quad - 0.5 * dimf * _LOG_2PI - log_det_tri(B, dim)


def weighted_mean_cov(x, w):
    """Weighted mean and covariance sufficient statistics.

    ``x``: [N, D] samples, ``w``: [N] nonnegative weights.  Returns
    (mean [D], cov [D, D], sumw scalar) with cov normalized by sumw — the
    M-step statistics of the EM fit (automix.c:796-810) as two matmuls.
    """
    sumw = jnp.sum(w)
    mean = (w @ x) / sumw
    xc = x - mean
    cov = jnp.einsum("n,ni,nj->ij", w, xc, xc) / sumw
    return mean, cov, sumw
