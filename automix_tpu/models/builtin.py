"""Built-in target distributions: the reference test-suite scenarios.

Pure-JAX re-derivations of the nine targets in ``tests/test_automix.c``
(reference lines cited per function): three 1-D direct samplers, three
2-parameter inference problems over ten fixed observations, and three
two-model RJMCMC model-selection problems.  These serve both as examples
and as the engine's parity-test targets (BASELINE.md).
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np
from jax.scipy.special import gammaln

from automix_tpu.config import NEG_INF
from automix_tpu.model import Model, ModelSet, memoized_set
from automix_tpu.ops.plmath import pal_gammaln

# Ten fixed observations shared by the parameter-estimation targets
# (tests/test_automix.c:38-40).
DATA_SAMPLES = np.array([
    0.50613293, 0.70961096, 0.28166951, 0.12532996, 0.46374168,
    0.58337466, 0.52458217, 0.56052633, 0.57215576, 0.68698825,
])


# --- 1-D direct samplers ------------------------------------------------

def logp_normal_sampler(theta):
    """N(0.5, 1) up to a constant (tests/test_automix.c:256-263)."""
    x = theta[0]
    return -0.5 * (x - 0.5) ** 2


def logp_truncnormal_sampler(theta):
    """N(1, 1) truncated to (0, 10) (tests/test_automix.c:242-254)."""
    x = theta[0]
    lp = -0.5 * (x - 1.0) ** 2
    return jnp.where((x > 0.0) & (x < 10.0), lp, NEG_INF)


def logp_beta_sampler(theta):
    """Beta(2, 2) (tests/test_automix.c:265-275)."""
    x = theta[0]
    a, b = 2.0, 2.0
    inside = (x > 0.0) & (x < 1.0)
    xs = jnp.where(inside, x, 0.5)   # keep log() finite off-support
    lp = ((a - 1.0) * jnp.log(xs) + (b - 1.0) * jnp.log1p(-xs)
          + gammaln(a + b) - gammaln(a) - gammaln(b))
    return jnp.where(inside, lp, NEG_INF)


# Column forms of the 1-D samplers for the fused Pallas sweep kernel
# (see Model.logp_cols).  ``rows[i]`` carries coordinate i of a whole
# lane block; everything is elementwise.

def cols_normal_sampler(rows):
    x = rows[0]
    return -0.5 * (x - 0.5) ** 2


def cols_truncnormal_sampler(rows):
    x = rows[0]
    lp = -0.5 * (x - 1.0) ** 2
    return jnp.where((x > 0.0) & (x < 10.0), lp, NEG_INF)


_LOG_BETA_2_2 = 1.791759469228055  # gammaln(4) - 2*gammaln(2) = log 6


def cols_beta_sampler(rows):
    x = rows[0]
    inside = (x > 0.0) & (x < 1.0)
    xs = jnp.where(inside, x, 0.5)
    lp = jnp.log(xs) + jnp.log1p(-xs) + _LOG_BETA_2_2
    return jnp.where(inside, lp, NEG_INF)


# --- 2-parameter inference over DATA_SAMPLES ----------------------------

def _make_params_targets(data):
    data = jnp.asarray(data)
    n = data.shape[0]

    def logp_normal_params(theta):
        """Normal(x0, sigma) likelihood of the data; theta = (sigma, x0)
        (tests/test_automix.c:283-293).  The reference has no explicit
        sigma > 0 guard, but its log(sigma) returns NaN for sigma <= 0 and
        the NaN acceptance comparison always rejects — so sigma <= 0 is
        effectively out of support; we guard explicitly (this matters: an
        even |sigma| extension would double the model's evidence)."""
        sigma, x0 = theta[0], theta[1]
        ok = sigma > 0.0
        ssafe = jnp.where(ok, sigma, 1.0)
        ss = jnp.sum(-((data - x0) ** 2))
        lp = -n * jnp.log(ssafe) + ss / (2.0 * ssafe * ssafe)
        return jnp.where(ok, lp, NEG_INF)

    def logp_beta_params(theta):
        """Beta(alpha, beta) likelihood; theta = (alpha, beta)
        (tests/test_automix.c:295-309)."""
        a, b = theta[0], theta[1]
        ok = (a > 0.0) & (b > 0.0)
        asafe = jnp.where(ok, a, 1.0)
        bsafe = jnp.where(ok, b, 1.0)
        lp = jnp.sum((asafe - 1.0) * jnp.log(data)
                     + (bsafe - 1.0) * jnp.log1p(-data))
        lp = lp + n * (gammaln(asafe + bsafe) - gammaln(asafe) - gammaln(bsafe))
        return jnp.where(ok, lp, NEG_INF)

    def logp_gamma_params(theta):
        """Gamma(alpha, beta) likelihood; theta = (alpha, beta)
        (tests/test_automix.c:311-321).  The reference leaves the positivity
        guard out here (NaNs rejected downstream); we guard explicitly."""
        a, b = theta[0], theta[1]
        ok = (a > 0.0) & (b > 0.0)
        asafe = jnp.where(ok, a, 1.0)
        bsafe = jnp.where(ok, b, 1.0)
        lp = jnp.sum((asafe - 1.0) * jnp.log(data) - bsafe * data)
        lp = lp + n * (asafe * jnp.log(bsafe) - gammaln(asafe))
        return jnp.where(ok, lp, NEG_INF)

    return logp_normal_params, logp_beta_params, logp_gamma_params


def _make_params_targets_cols(data):
    """Column forms of the three parameter-estimation targets for the
    fused Pallas sweep kernel (Model.logp_cols).

    The per-observation reductions of the scalar forms collapse to fixed
    sufficient statistics (sum, sum of squares, sum of logs, sum of
    log1p-complements), so each evaluation is a handful of elementwise ops
    per lane — and ``gammaln`` becomes the Mosaic-lowerable
    ``pal_gammaln``.  Algebraically identical to ``_make_params_targets``;
    floating-point equivalence is property-tested in tests/test_fused.py.
    """
    d = np.asarray(data, np.float64)
    n = float(d.shape[0])
    s1 = float(d.sum())
    s2 = float((d * d).sum())
    sl = float(np.log(d).sum())
    sl1 = float(np.log1p(-d).sum())

    def cols_normal(rows):
        sigma, x0 = rows[0], rows[1]
        ok = sigma > 0.0
        ssafe = jnp.where(ok, sigma, 1.0)
        ss = -(s2 - 2.0 * x0 * s1 + n * x0 * x0)
        lp = -n * jnp.log(ssafe) + ss / (2.0 * ssafe * ssafe)
        return jnp.where(ok, lp, NEG_INF)

    def cols_beta(rows):
        a, b = rows[0], rows[1]
        ok = (a > 0.0) & (b > 0.0)
        asafe = jnp.where(ok, a, 1.0)
        bsafe = jnp.where(ok, b, 1.0)
        lp = (asafe - 1.0) * sl + (bsafe - 1.0) * sl1 + n * (
            pal_gammaln(asafe + bsafe) - pal_gammaln(asafe)
            - pal_gammaln(bsafe))
        return jnp.where(ok, lp, NEG_INF)

    def cols_gamma(rows):
        a, b = rows[0], rows[1]
        ok = (a > 0.0) & (b > 0.0)
        asafe = jnp.where(ok, a, 1.0)
        bsafe = jnp.where(ok, b, 1.0)
        lp = (asafe - 1.0) * sl - bsafe * s1 + n * (
            asafe * jnp.log(bsafe) - pal_gammaln(asafe))
        return jnp.where(ok, lp, NEG_INF)

    return cols_normal, cols_beta, cols_gamma


logp_normal_params, logp_beta_params, logp_gamma_params = \
    _make_params_targets(DATA_SAMPLES)
cols_normal_params, cols_beta_params, cols_gamma_params = \
    _make_params_targets_cols(DATA_SAMPLES)


# --- assembled ModelSets (the nine test scenarios) ----------------------

@memoized_set
def normal_sampler_set(**kw):
    """Scenario 1 (tests/test_automix.c:49-54): mean 0.5, sigma 1.0."""
    return ModelSet([Model("normal_sampler", 1, logp_normal_sampler,
                           init=np.array([0.5]),
                           logp_cols=cols_normal_sampler)], **kw)


@memoized_set
def truncnormal_sampler_set(**kw):
    """Scenario 2 (tests/test_automix.c:56-61): mean~1.3, sigma~1.5 claimed;
    support within (0, 10)."""
    return ModelSet([Model("truncnormal_sampler", 1, logp_truncnormal_sampler,
                           init=np.array([1.0]),
                           logp_cols=cols_truncnormal_sampler)], **kw)


@memoized_set
def beta_sampler_set(**kw):
    """Scenario 3 (tests/test_automix.c:63-68): mean 0.5."""
    return ModelSet([Model("beta_sampler", 1, logp_beta_sampler,
                           init=np.array([0.5]),
                           logp_cols=cols_beta_sampler)], **kw)


@memoized_set
def normal_params_set(**kw):
    """Scenario 4 (tests/test_automix.c:70-76): E[sigma]~0.2, E[x0]~0.5."""
    return ModelSet([Model("normal_params", 2, logp_normal_params,
                           init=np.array([0.5, 0.5]),
                           logp_cols=cols_normal_params)], **kw)


@memoized_set
def beta_params_set(**kw):
    """Scenario 5 (tests/test_automix.c:78-84): E[alpha]~4.5, E[beta]~5.0."""
    return ModelSet([Model("beta_params", 2, logp_beta_params,
                           init=np.array([2.0, 2.0]),
                           logp_cols=cols_beta_params)], **kw)


@memoized_set
def gamma_params_set(**kw):
    """Scenario 6 (tests/test_automix.c:86-92): E[alpha]~7.0, E[beta]~14.5."""
    return ModelSet([Model("gamma_params", 2, logp_gamma_params,
                           init=np.array([9.0, 2.0]),
                           logp_cols=cols_gamma_params)], **kw)


@memoized_set
def gamma_beta_set(**kw):
    """Scenario 7 (tests/test_automix.c:94-103): p(M=Gamma)~0.37."""
    return ModelSet([
        Model("gamma", 2, logp_gamma_params, init=np.array([9.0, 2.0]),
              logp_cols=cols_gamma_params),
        Model("beta", 2, logp_beta_params, init=np.array([2.0, 2.0]),
              logp_cols=cols_beta_params),
    ], **kw)


@memoized_set
def normal_beta_set(**kw):
    """Scenario 8 (tests/test_automix.c:105-114): p(M=Normal)~0.95."""
    return ModelSet([
        Model("normal", 2, logp_normal_params, init=np.array([0.5, 0.5]),
              logp_cols=cols_normal_params),
        Model("beta", 2, logp_beta_params, init=np.array([2.0, 2.0]),
              logp_cols=cols_beta_params),
    ], **kw)


@memoized_set
def normal_gamma_set(**kw):
    """Scenario 9 (tests/test_automix.c:116-125): p(M=Normal)~0.97."""
    return ModelSet([
        Model("normal", 2, logp_normal_params, init=np.array([0.5, 0.5]),
              logp_cols=cols_normal_params),
        Model("gamma", 2, logp_gamma_params, init=np.array([9.0, 2.0]),
              logp_cols=cols_gamma_params),
    ], **kw)
