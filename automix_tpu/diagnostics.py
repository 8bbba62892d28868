"""Run diagnostics: Sokal integrated autocorrelation time.

The reference estimates the IACT of the model-index trace with Sokal's
adaptive truncated periodogram over a hand-rolled radix-4 FFT
(``sokal``, logwrite.c:354-403; FFT logwrite.c:405-651; called at
logwrite.c:228 on ``nkeep = 2^min(15, log2(nsweep/2))`` thinned samples,
automix.c:367-370).  Note the reference's convention: tau is the sum of the
autocorrelation function over all lags (twice Sokal's usual definition,
logwrite.c:8-11).

Here the FFT is ``jnp.fft`` and the estimator is vectorized over many
chains' traces — the engine reports a cross-chain IACT distribution where
the reference reports one number.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def sokal_iact(x):
    """IACT of one series [n] (n >= 4).  Returns (tau, var, m, rho).

    Mirrors logwrite.c:354-403: power spectrum with DC removed, transformed
    back to autocovariances, then Sokal's adaptive truncation: stop at the
    first lag i where  -1/3 + sum_{j<=i}(rho_j - 1/6) < 0, with
    tau = 2*(sum + i/6) and m = i + 1 retained coefficients.
    """
    x = jnp.asarray(x, jnp.float32)
    n = x.shape[-1]
    f = jnp.fft.fft(x)
    p = jnp.abs(f) ** 2
    p = p.at[..., 0].set(0.0)           # remove DC (mean), logwrite.c:377
    # The reference applies its *forward* transform twice; for the real,
    # symmetric power spectrum that equals n * ifft, so autocovariances
    # match up to the same scale.
    a = jnp.real(jnp.fft.fft(p))
    var = a[..., 0] / (n * (n - 1.0))   # logwrite.c:380
    rho = a / jnp.maximum(a[..., 0:1], 1e-30)
    partial = jnp.cumsum(rho - 1.0 / 6.0, axis=-1) - 1.0 / 3.0
    hit = partial < 0.0
    any_hit = jnp.any(hit, axis=-1)
    first = jnp.argmax(hit, axis=-1)
    i = jnp.where(any_hit, first, n - 1)
    s_i = jnp.take_along_axis(partial, i[..., None], axis=-1)[..., 0]
    tau = 2.0 * (s_i + i / 6.0)
    m = i + 1
    return tau, var, m, rho


def sokal_batched(traces, stride: int = 1):
    """IACT over a [nsweep, n_chains] batch of model-index traces.

    Returns dict with per-chain tau plus summary stats.  The series length
    is truncated to the largest power of two (the reference's nkeep
    discipline, automix.c:367-370), capped at 2^20 (logwrite.c:359).

    ``stride`` is the number of sweeps between consecutive trace entries
    (``RunStats.trace_stride``; 1 for per-sweep traces, ``trace_every``
    for decimated fused-engine traces).  The periodogram sees the thinned
    series, so its raw tau is in units of ``stride`` sweeps; all reported
    tau values are scaled by ``stride`` into **sweep** units — the units
    the reference's ``_log.data`` tau uses (logwrite.c:354-403 runs on a
    per-``nsokal``-sweep series and reports tau*nsokal implicitly via
    nsokal=1 in the library path).  ``rho``/``m`` stay in thinned-lag
    units (lag i of ``rho`` is ``i*stride`` sweeps apart).
    """
    traces = np.asarray(traces, np.float32)
    if traces.ndim == 1:
        traces = traces[:, None]
    n = traces.shape[0]
    nkeep = 1 << min(20, int(np.log2(max(n, 4))))
    x = jnp.asarray(traces[n - nkeep:].T)          # [n_chains, nkeep]
    tau, var, m, rho = jax.jit(sokal_iact)(x)
    tau = np.asarray(tau) * stride
    return {
        "tau": tau,
        "tau_mean": float(tau.mean()),
        "tau_median": float(np.median(tau)),
        "var": np.asarray(var),
        "m": np.asarray(m),
        "rho": np.asarray(rho),
        "nkeep": nkeep,
        "stride": stride,
    }


def split_rhat(traces):
    """Split-R̂ (Gelman–Rubin) over a [nsweep, n_chains] trace batch.

    Engine-native diagnostic with no reference counterpart (the reference
    runs exactly one chain, automix.c:90-125): each chain's trace is split
    in half, and R̂ = sqrt(((n-1)/n + B/(n W)) ) compares between-half
    variance B to within-half variance W.  Values near 1 indicate the
    chains agree; > 1.01 flags non-convergence.
    """
    x = np.asarray(traces, np.float64)
    if x.ndim == 1:
        x = x[:, None]
    n = (x.shape[0] // 2) * 2
    halves = x[:n].T.reshape(-1, 2, n // 2).reshape(-1, n // 2)  # [2S, n/2]
    m, hn = halves.shape
    means = halves.mean(axis=1)
    w = halves.var(axis=1, ddof=1).mean()
    b = hn * means.var(ddof=1)
    if w <= 0.0:
        return 1.0 if b <= 0.0 else float("inf")
    return float(np.sqrt((hn - 1) / hn + b / (hn * w)))


def ess(traces, stride: int = 1):
    """Cross-chain effective sample size of a [nsweep, n_chains] batch:
    total sweeps deflated by the mean Sokal IACT in sweep units (tau
    already uses the reference's sum-over-all-lags convention, so
    ESS = N_sweeps / max(tau_sweeps, 1)).  ``stride`` is the thinning of
    the trace (``RunStats.trace_stride``); both the total and tau scale
    by it, so ESS of a well-mixed chain is thinning-invariant until the
    stride exceeds tau."""
    x = np.asarray(traces)
    if x.ndim == 1:
        x = x[:, None]
    res = sokal_batched(x, stride=stride)
    total = x.shape[0] * stride * x.shape[1]
    return total / max(res["tau_mean"], float(stride), 1.0)


def acceptance_rates(stats):
    """Acceptance-rate summary, the `_log.data` block (logwrite.c:334-339)."""
    def rate(a, b):
        return a / b if b else float("nan")

    return {
        "block_rwm": rate(stats.naccrwmb, stats.ntryrwmb),
        "single_rwm": rate(stats.naccrwms, stats.ntryrwms),
        "rj": rate(stats.nacctd, stats.ntrytd),
    }
