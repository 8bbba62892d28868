"""Mosaic-lowerable math helpers shared by the fused Pallas sweep kernel
and the column-form model densities.

``jax.lax.lgamma`` has no Pallas TPU lowering (Mosaic rejects the
primitive), so the fused hot loop — whose Beta/Gamma targets call it up to
nine times per sweep — needs a hand-rolled log-gamma built from the
elementary ops Mosaic does support (mul/add/log/reciprocal).  The same
functions run unmodified under plain XLA, which is how the accuracy tests
pin them against ``jax.scipy.special.gammaln``.

The reference computes log-gamma with the Cody-Hillstrom rational minimax
approximation (automix.c:1323-1579, four branches + machine constants);
branchy rational approximations are hostile to a vector unit, so this is a
branch-free shifted Stirling series instead: shift the argument up by 4 via
the recurrence lgamma(x) = lgamma(x+4) - log(x(x+1)(x+2)(x+3)), then apply
Stirling with three correction terms, whose truncation error at z >= 4 is
~4e-8 — below float32 resolution.
"""

from __future__ import annotations

import jax.numpy as jnp

HALF_LOG_2PI = 0.9189385332046727


def pal_gammaln(x):
    """log Gamma(x) for x > 0, branch-free, float32, Mosaic-lowerable.

    Callers must guard the domain (the builtin densities substitute a safe
    positive value off-support before calling, mirroring their existing
    guards around ``gammaln``).  Relative error < 1e-6 over x in (0, 1e4].
    """
    p = x * (x + 1.0) * (x + 2.0) * (x + 3.0)
    z = x + 4.0
    r = 1.0 / z
    r2 = r * r
    series = r * (1.0 / 12.0 + r2 * (-1.0 / 360.0 + r2 * (1.0 / 1260.0)))
    return ((z - 0.5) * jnp.log(z) - z + HALF_LOG_2PI + series
            - jnp.log(p))
