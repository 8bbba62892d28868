"""Random-variate helpers on top of JAX's counter-based PRNG.

The reference uses the global-state "SuperDuper" generator
(``automix.c:1290-1316``) with Box-Muller normals (``automix.c:1639-1661``),
a rejection-loop Gamma sampler (``automix.c:1585-1637``), and multivariate
Student-t scaling (``automix.c:1663-1680``).  A global sequential RNG cannot
drive 10^4 parallel chains; this engine uses threefry keys (one per chain,
folded with the sweep counter), so parity with the reference is statistical
rather than bitwise — as pinned down in SURVEY.md section 7 hard-part (4).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def rand_t(key, shape, dof: int, dtype=jnp.float32):
    """Independent Student-t(dof) draws; dof == 0 means pure N(0,1).

    Mirrors ``rt`` (automix.c:1663-1680) with one deliberate difference:
    the reference divides all n coordinates of a single call by one shared
    chi-square draw (a multivariate-t), yet accounts for the proposal in the
    RJ acceptance ratio as a product of independent t densities
    (automix.c:1174-1183).  We draw independent t variates so the sampled
    proposal matches the density used in the ratio.  For the default
    dof == 0 both versions coincide exactly.
    """
    z = jax.random.normal(key, shape, dtype=dtype)
    if dof <= 0:
        return z
    key_g = jax.random.fold_in(key, 1)
    s = 0.5 * dof
    g = jax.random.gamma(key_g, s, shape, dtype=dtype)
    return z / jnp.sqrt(g / s)


def log_t_pdf(z, dof: int):
    """Log-pdf of a scalar t(dof) variate — ``ltprob`` (automix.c:1717-1725)."""
    from jax.scipy.special import gammaln

    dof_f = jnp.asarray(float(dof), z.dtype)
    const = (
        gammaln(0.5 * (dof_f + 1.0))
        - gammaln(0.5 * dof_f)
        - 0.5 * jnp.log(dof_f * jnp.pi)
    )
    return const - 0.5 * (dof_f + 1.0) * jnp.log1p(z * z / dof_f)


_HALF_LOG_2PI = 0.9189385332046727  # logrtpi of automix.c:1052


def log_std_normal_pdf(z):
    """Log-pdf of N(0,1); the Gaussian branch of the RJ dimension-matching
    Jacobian terms (automix.c:1180-1182, 1199-1202)."""
    return -0.5 * z * z - _HALF_LOG_2PI


def latent_log_pdf(z, dof: int):
    """Log-density of one latent filler coordinate: t(dof) or N(0,1)."""
    if dof > 0:
        return log_t_pdf(z, dof)
    return log_std_normal_pdf(z)


def categorical_from_logits(key, logits, axis: int = -1):
    """Sample an index from unnormalized (possibly -inf masked) logits.

    Replaces the reference's inverse-CDF scans over normalized weights
    (component allocation automix.c:1111-1119, model choice
    automix.c:1146-1154, destination component automix.c:1161-1169).
    Gumbel-max on the logit scale avoids the reference's underflow guard
    (automix.c:1102-1110) entirely.
    """
    return jax.random.categorical(key, logits, axis=axis)


def masked_permutation(key, n_active, dmax: int):
    """Per-call random permutation indices of the first ``n_active`` slots.

    TPU-native replacement for the Fisher-Yates ``perm`` (automix.c:1703-1715)
    used by the optional doPerm mode (automix.c:1184-1194): draw uniforms,
    push inactive slots to the tail, argsort.  Returns int32 [dmax] indices
    such that ``x[idx]`` permutes the active prefix and keeps inactive slots
    in the tail (in arbitrary order — callers mask the tail anyway).
    """
    u = jax.random.uniform(key, (dmax,))
    i = jnp.arange(dmax)
    sort_key = jnp.where(i < n_active, u, 1.0 + i.astype(u.dtype))
    return jnp.argsort(sort_key).astype(jnp.int32)
