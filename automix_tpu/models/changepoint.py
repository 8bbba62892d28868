"""Poisson change-point model selection (thesis section 5.5.2, Green 1995).

Re-derivation of ``usercpt.c`` (coal-mining disaster times) and its
rescaled variant ``usercptrs.c``: six models, model k having k+1 change
points and k+2 Poisson rates (dims 3,5,...,13), with Gamma(alpha, beta)
rate priors, a Poisson(lambda) prior on the number of change points and an
even-order-statistics prior on their positions; out-of-constraint states
(negative rates, unordered change points) are hard-rejected
(usercpt.c:93-98).

The C likelihood walks the sorted event list segment by segment
(usercpt.c:115-130); here segment counts come from one vectorized
``searchsorted`` over the static event array.

Two deliberate deviations from the reference, both reference defects:

1. The C walk advances at most one segment boundary per event, so for any
   state with an *empty* segment the events that follow it are credited to
   the wrong rate, and the ``j > nsteps`` early return (usercpt.c:123-125)
   can drop the tail likelihood entirely.  The histogram assignment here is
   the exact step-function Poisson likelihood; the two agree for every
   state whose segments are all non-empty (verified pointwise against the
   compiled reference), and the oracle fixtures in tests/data restrict to
   those states.
2. The reference binaries ``amcpt``/``amcptrs`` segfault inside their own
   ``estimate_conditional_probs`` on this example (any seed, any mode, cc
   -O3; the bundled CI never runs them) — posterior-level oracle parity is
   therefore impossible, and pointwise log-density parity is the check of
   record.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp
from scipy.special import gammaln as np_gammaln

from automix_tpu.model import Model, ModelSet, memoized_set

# Coal-mining disaster times (usercpt.c:56-76), interval [0, 40907].
COAL_DATA = np.array([
    74, 231, 354, 356, 480, 492, 496, 506, 722, 802,
    814, 847, 913, 1145, 1971, 2011, 2023, 2052, 2242, 2339,
    2404, 2590, 2613, 2705, 2902, 3333, 3349, 3503, 3598, 3623,
    3642, 3720, 3922, 3958, 4068, 4344, 4360, 4448, 4673, 4726,
    4743, 5281, 5468, 5502, 5603, 5644, 5783, 5825, 5826, 6076,
    6156, 6159, 6483, 6539, 6570, 6666, 6736, 6777, 6870, 6894,
    6985, 7128, 7144, 7171, 7315, 7360, 7366, 7574, 7603, 7715,
    7758, 7951, 8085, 8505, 8600, 8725, 8759, 8886, 9104, 9106,
    9106, 9484, 9520, 9535, 9566, 9781, 9792, 9929, 9933, 9948,
    10020, 10116, 10240, 10290, 10410, 10613, 10789, 10844, 10937, 10996,
    11311, 11370, 11431, 11432, 11445, 11634, 11979, 11999, 12080, 12366,
    12480, 12588, 12776, 13009, 13037, 13059, 13120, 13198, 13297, 13623,
    13898, 13952, 14169, 14282, 14314, 14702, 14853, 15214, 15526, 15880,
    16187, 16462, 16540, 16557, 17762, 18406, 18873, 19744, 19792, 19915,
    20371, 20869, 20918, 21049, 21231, 21486, 21680, 21904, 22470, 22932,
    23160, 23966, 24483, 26126, 26180, 26506, 27818, 28166, 28911, 29128,
    29248, 29523, 29543, 29609, 29901, 29905, 30273, 30580, 30916, 30935,
    31264, 31594, 31906, 32442, 32587, 32662, 33026, 33063, 33082, 33238,
    33285, 33414, 35044, 35073, 35290, 35297, 35315, 36673, 39039, 39991,
    40623], dtype=np.float64)


def make_changepoint_set(data, t_end, alpha, beta, lam_prior, reject_value,
                         nmodels: int = 6, **kw) -> ModelSet:
    """Build the 6-model change-point ModelSet for a given dataset/scale."""
    data = np.sort(np.asarray(data, np.float64))
    n_events = len(data)
    data_j = jnp.asarray(data, jnp.float32)
    abcon = alpha * np.log(beta) - float(np_gammaln(alpha))
    logl = np.log(t_end)

    models = []
    for k in range(nmodels):
        nsteps = k + 1
        dim = 2 * k + 3     # k+2 heights + k+1 change points (usercpt.c:27)

        def logp(theta, nsteps=nsteps):
            h = theta[: nsteps + 1]                       # rates
            s_in = theta[nsteps + 1: 2 * nsteps + 1]      # change points
            s = jnp.concatenate([jnp.zeros(1, theta.dtype), s_in,
                                 jnp.full((1,), t_end, theta.dtype)])
            ds = jnp.diff(s)                              # segment lengths
            ok = jnp.all(h > 0.0) & jnp.all(ds > 0.0)     # usercpt.c:93-98
            hs = jnp.where(ok, h, 1.0)
            dss = jnp.where(ok, ds, 1.0)

            # prior (usercpt.c:100-109)
            lp = -lam_prior + nsteps * np.log(lam_prior) \
                - float(np_gammaln(nsteps + 1.0))
            lp = lp + jnp.sum(abcon + (alpha - 1.0) * jnp.log(hs)
                              - beta * hs + jnp.log(dss))
            lp = lp + float(np_gammaln(2.0 * (nsteps + 1))) \
                - (2.0 * nsteps + 1.0) * logl

            # likelihood: per-segment event counts x log-rates
            # (usercpt.c:115-130 as one searchsorted histogram)
            seg = jnp.searchsorted(s_in, data_j, side="left")  # [n_events]
            onehot = jax.nn.one_hot(seg, nsteps + 1, dtype=theta.dtype)
            nj = onehot.sum(axis=0)
            llh = jnp.sum(nj * jnp.log(hs) - hs * dss)
            return jnp.where(ok, lp + llh, reject_value)

        # stage-1 inits (usercpt.c:32-40): rates at the prior mean, change
        # points evenly spaced
        init = np.empty(dim)
        init[: nsteps + 1] = alpha / beta
        init[nsteps + 1:] = t_end * np.arange(1, nsteps + 1) / (nsteps + 1)
        models.append(Model(f"cpt_k{k + 1}", dim, logp, init=init))
    return ModelSet(models, **kw)


import jax  # noqa: E402  (used inside logp closures)


@memoized_set
def cpt_set(**kw) -> ModelSet:
    """usercpt.c: raw time scale [0, 40907], Gamma(1, 200) rate priors."""
    return make_changepoint_set(COAL_DATA, 40907.0, alpha=1.0, beta=200.0,
                                lam_prior=3.0, reject_value=-10000.0, **kw)


@memoized_set
def cptrs_set(**kw) -> ModelSet:
    """usercptrs.c: times rescaled by 1459 (rounded to 2 decimals as in the
    reference), T = 28.04, beta = 0.137 — the scaling-sensitivity variant."""
    data = np.round(COAL_DATA / 1459.0, 2)
    return make_changepoint_set(data, 28.04, alpha=1.0, beta=0.137,
                                lam_prior=3.0, reject_value=-100000.0, **kw)
