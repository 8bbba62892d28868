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


# ---------------------------------------------------------------------------
# Fast counter-hash sweep randomness (the stage-3 "fast" RNG mode).
#
# threefry2x32 costs ~67 VPU ops per 32-bit word — measured 55us of a 147us
# tutorial sweep at 32768 chains, i.e. the single largest line item of the
# hot loop.  MCMC accept/reject and proposal noise do not need a
# cryptographic generator; what they need is (a) avalanche-quality mixing of
# a unique per-value counter, (b) a period that cannot recycle within a run,
# and (c) position-based indexing so sharding is a pure layout change.
#
# Each 32-bit output word is the XOR of two independent integer hashes
# (triple32 and lowbias32, both full-avalanche finalizers from the
# hash-prospector project) of the value's unique counter, each salted by a
# different 32-bit digest of (seed, sweep).  A single 32-bit salt would
# birthday-collide across ~2^16 sweeps; the XOR of two independently salted
# hashes gives an effective 64-bit (seed, sweep) state, so stream reuse is
# impossible in any realistic run.  Statistical quality is validated in
# tests/test_sweep_rng.py and by the exact-posterior suite, which runs the
# full sampler on this generator.
# ---------------------------------------------------------------------------

_U = jnp.uint32


def _triple32(x):
    x = x ^ (x >> 17)
    x = x * _U(0xED5AD4BB)
    x = x ^ (x >> 11)
    x = x * _U(0xAC4C1B51)
    x = x ^ (x >> 15)
    x = x * _U(0x31848BAB)
    return x ^ (x >> 14)


def _lowbias32(x):
    x = x ^ (x >> 16)
    x = x * _U(0x7FEB352D)
    x = x ^ (x >> 15)
    x = x * _U(0x846CA68B)
    return x ^ (x >> 16)


def counter_bits(seed, sweep, counters):
    """Avalanche-hashed random words for unique uint32 ``counters``."""
    seed = jnp.asarray(seed).astype(_U)
    sweep = jnp.asarray(sweep).astype(_U)
    salt1 = _triple32(sweep ^ (seed * _U(0x9E3779B9)))
    salt2 = _lowbias32(sweep + _U(0x85EBCA6B) + seed * _U(0xC2B2AE35))
    c = counters.astype(_U)
    return _triple32(c ^ salt1) ^ _lowbias32(c + salt2)


def _bits_to_uniform(bits, dtype):
    """Top 24 bits -> strictly interior uniforms in (0, 1)."""
    return (bits >> 8).astype(dtype) * dtype(2.0 ** -24) + dtype(2.0 ** -25)


def fast_sweep_randoms(seed, sweep, chain0, n_chains: int, mu_count: int,
                       mz_count: int, dtype=jnp.float32):
    """Per-sweep uniforms [S, MU] and normals [S, MZ] from the counter
    hash.  ``chain0`` is this shard's global chain offset (0 unsharded);
    draws depend only on (seed, sweep, global chain index) — resumable and
    bitwise sharding-invariant."""
    w = mu_count + mz_count
    rows = (chain0 + jnp.arange(n_chains, dtype=jnp.int32)).astype(_U)
    counters = rows[:, None] * _U(w) + jnp.arange(w, dtype=_U)[None, :]
    bits = counter_bits(seed, sweep, counters)
    uall = _bits_to_uniform(bits, jnp.dtype(dtype).type)
    u = uall[:, :mu_count]
    z = jnp.sqrt(jnp.asarray(2.0, dtype)) * jax.lax.erf_inv(
        2.0 * uall[:, mu_count:] - 1.0)
    return u, z


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
