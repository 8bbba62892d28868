"""Tumour-count model selection (thesis section 5.5.3, Haigis & Dove).

Re-derivation of ``userrb9.c``: 66 tumour counts from 4 mouse groups; ten
models choosing, per group, Poisson vs Negative-Binomial and shared vs
distinct rates lambda / over-dispersions kappa, encoded by per-model index
maps (userrb9.c:90-141).  Gamma priors on all positive parameters;
negative parameters hard-rejected (userrb9.c:79-84).
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp
from jax.scipy.special import gammaln
from scipy.special import gammaln as np_gammaln

from automix_tpu.model import Model, ModelSet, memoized_set

# userrb9.c:72-77: counts for the 4 groups, concatenated
X_DATA = np.array([
    121, 169, 112, 199, 80, 121, 194, 140, 131, 199, 262,
    121, 140, 166, 150, 103, 5, 15, 13, 9, 15, 13,
    13, 9, 18, 12, 8, 7, 16, 11, 12, 8, 14,
    12, 20, 12, 8, 11, 10, 10, 10, 7, 8, 7,
    8, 10, 11, 7, 4, 6, 9, 7, 5, 7, 3,
    7, 4, 11, 15, 10, 6, 10, 6, 12, 6, 11], dtype=np.float64)
N_OBS = [16, 17, 15, 18]    # userrb9.c:85-88
GROUPS = np.repeat(np.arange(4), N_OBS)

# hyperparameters (userrb9.c:15)
ALPHA1, ALPHA2, BETA1, BETA2 = 2.0, 1.0, 0.1, 2.0

# per-model structure (userrb9.c:90-141)
N_LAMBDA = [3, 3, 3, 3, 3, 3, 3, 4, 4, 4]
N_KAPPA = [1, 1, 1, 1, 1, 1, 2, 1, 1, 1]


def _pindic(k):
    """Which groups are Negative-Binomial (1) vs Poisson (0)
    (userrb9.c:102-114)."""
    p = [1, 0, 0, 1]
    if k in (3, 9):
        p[1] = 1
    if k in (2, 9):
        p[2] = 1
    if k in (0, 4, 7):
        p[3] = 0
    return p


def _lambda_map(k):
    """theta index of each group's rate (userrb9.c:116-127)."""
    lam_idx = [0, 1, None, None]
    lam_idx[2] = 1 if (k < 4 or k == 6) else 2
    lam_idx[3] = 2 if k < 7 else 3
    return lam_idx


def _kappa_map(k):
    """theta index of each group's over-dispersion (userrb9.c:128-141)."""
    k0 = 3 if k < 7 else 4
    kap_idx = [k0, k0, k0, k0]
    if k == 6:
        kap_idx[3] = 4
    return kap_idx


def _build_batched_logpost(dtype=jnp.float32):
    """Hand-vectorized ``(k [S], theta [S, 5]) -> [S]`` kernel.

    The ten rb9 models share one formula and differ only in index maps; a
    ``lax.switch`` would evaluate all ten densities per chain.  This kernel
    instead encodes the maps as [K, ...] tables and selects per chain with
    one-hot contractions (matching the gather-free hot-loop design), so the
    whole model family costs one density evaluation regardless of K.
    """
    K, G, D = 10, 4, 5
    x = jnp.asarray(X_DATA, dtype)
    lgx1 = jnp.asarray(np_gammaln(X_DATA + 1.0), dtype)
    groups = GROUPS

    # [K, G, D] one-hot selectors: group g's rate / dispersion slot of theta
    sel_lam = np.zeros((K, G, D), np.float32)
    sel_kap = np.zeros((K, G, D), np.float32)
    pindic_t = np.zeros((K, G), np.float32)
    # per-theta-slot prior coefficients: slot i is Gamma(a1, b1) for rates,
    # Gamma(a2, b2) for dispersions, zero beyond the model's dim
    a_coef = np.zeros((K, D), np.float32)
    b_coef = np.zeros((K, D), np.float32)
    const = np.zeros((K,), np.float32)
    for k in range(K):
        ql, qk = N_LAMBDA[k], N_KAPPA[k]
        for g, idx in enumerate(_lambda_map(k)):
            sel_lam[k, g, idx] = 1.0
        for g, idx in enumerate(_kappa_map(k)):
            sel_kap[k, g, idx] = 1.0
        pindic_t[k] = _pindic(k)
        a_coef[k, :ql] = ALPHA1
        a_coef[k, ql:ql + qk] = ALPHA2
        b_coef[k, :ql] = BETA1
        b_coef[k, ql:ql + qk] = BETA2
        const[k] = (ql * (ALPHA1 * np.log(BETA1) - np_gammaln(ALPHA1))
                    + qk * (ALPHA2 * np.log(BETA2) - np_gammaln(ALPHA2)))
    sel_lam_j = jnp.asarray(sel_lam, dtype)
    sel_kap_j = jnp.asarray(sel_kap, dtype)
    pindic_j = jnp.asarray(pindic_t, dtype)
    a_j, b_j = jnp.asarray(a_coef, dtype), jnp.asarray(b_coef, dtype)
    const_j = jnp.asarray(const, dtype)
    dims_j = jnp.asarray([N_LAMBDA[k] + N_KAPPA[k] for k in range(K)],
                         jnp.int32)
    obs_onehot = jnp.asarray(np.eye(G, dtype=np.float32)[groups], dtype)  # [66, G]

    def batched(k, theta):
        S = theta.shape[0]
        onehot_k = jax.nn.one_hot(k, K, dtype=dtype)            # [S, K]
        dim_k = dims_j[k]
        in_dim = (jnp.arange(D)[None, :] < dim_k[:, None])
        ok = jnp.all((theta > 0.0) | ~in_dim, axis=1)
        th = jnp.where(in_dim & (theta > 0), theta, 1.0)

        a_k = onehot_k @ a_j                                    # [S, D]
        b_k = onehot_k @ b_j
        lp = (onehot_k @ const_j[:, None])[:, 0]
        lp = lp + jnp.sum(jnp.where(in_dim,
                                    (a_k - 1.0) * jnp.log(th) - b_k * th,
                                    0.0), axis=1)

        sel_l = jnp.einsum("sk,kgd->sgd", onehot_k, sel_lam_j)  # [S, G, D]
        sel_q = jnp.einsum("sk,kgd->sgd", onehot_k, sel_kap_j)
        lam_g = jnp.einsum("sgd,sd->sg", sel_l, th)             # [S, G]
        kap_g = jnp.einsum("sgd,sd->sg", sel_q, th)
        is_nb_g = onehot_k @ pindic_j                            # [S, G]
        lam_o = lam_g @ obs_onehot.T                             # [S, 66]
        kap_o = kap_g @ obs_onehot.T
        is_nb = is_nb_g @ obs_onehot.T

        pois = -lam_o + x[None, :] * jnp.log(lam_o) - lgx1[None, :]
        km1 = 1.0 / kap_o
        nb = (x[None, :] * jnp.log(lam_o) + gammaln(x[None, :] + km1)
              - lgx1[None, :] + km1 * jnp.log(km1) - gammaln(km1)
              - (x[None, :] + km1) * jnp.log(lam_o + km1))
        llh = jnp.sum(jnp.where(is_nb > 0.5, nb, pois), axis=1)
        return jnp.where(ok, lp + llh, -1e6)

    return batched


def _build_batched_cols():
    """Column form of the family kernel for the fused Pallas engine
    (ModelSet.batched_logpost_cols): one density evaluation per sweep for
    all ten models, with chains as vector lanes.

    Two reductions make this cheap inside a kernel that cannot call
    ``gammaln`` on 66 observations per lane:

    * per-group sufficient statistics — the Poisson term and every
      kappa-independent part of the NB term collapse to (n_g, sum x,
      sum lgamma(x+1)) computed once at build time;
    * distinct-value compression of the remaining kappa-dependent term:
      sum_i lgamma(x_i + 1/kappa) = sum_v c_v lgamma(v + 1/kappa) over
      the ~13 distinct counts per group, evaluated with the
      Mosaic-lowerable ``pal_gammaln``.

    Model structure (index maps, priors, NB-vs-Poisson flags,
    userrb9.c:90-141) enters as per-lane mask sums over the static
    tables, never as gathers.
    """
    from automix_tpu.ops.plmath import pal_gammaln

    K, G, D = 10, 4, 5
    dims_np = [N_LAMBDA[k] + N_KAPPA[k] for k in range(K)]
    # static per-group stats
    n_g, sx_g, clg_g, vals_g, cnts_g = [], [], [], [], []
    for g in range(G):
        xg = X_DATA[GROUPS == g]
        n_g.append(float(len(xg)))
        sx_g.append(float(xg.sum()))
        clg_g.append(float(np_gammaln(xg + 1.0).sum()))
        v, c = np.unique(xg, return_counts=True)
        vals_g.append([float(x) for x in v])
        cnts_g.append([float(x) for x in c])
    # static selection tables
    lam_sets = [[set() for _ in range(D)] for _ in range(G)]
    kap_sets = [[set() for _ in range(D)] for _ in range(G)]
    nb_sets = [set() for _ in range(G)]
    a_tab = np.zeros((K, D)); b_tab = np.zeros((K, D))
    const_tab = np.zeros(K)
    for k in range(K):
        ql, qk = N_LAMBDA[k], N_KAPPA[k]
        for g, idx in enumerate(_lambda_map(k)):
            lam_sets[g][idx].add(k)
        for g, idx in enumerate(_kappa_map(k)):
            kap_sets[g][idx].add(k)
        for g, p in enumerate(_pindic(k)):
            if p:
                nb_sets[g].add(k)
        a_tab[k, :ql] = ALPHA1
        a_tab[k, ql:ql + qk] = ALPHA2
        b_tab[k, :ql] = BETA1
        b_tab[k, ql:ql + qk] = BETA2
        const_tab[k] = (ql * (ALPHA1 * np.log(BETA1) - np_gammaln(ALPHA1))
                        + qk * (ALPHA2 * np.log(BETA2) - np_gammaln(ALPHA2)))

    def batched_cols(mks, rows):
        def msum(kset):
            return sum((mks[k] for k in sorted(kset)), 0.0)

        in_dim = [msum({k for k in range(K) if dims_np[k] > d})
                  for d in range(D)]
        ok = None
        th = []
        for d in range(D):
            pos = rows[d] > 0.0
            okd = pos | (in_dim[d] == 0.0)
            ok = okd if ok is None else ok & okd
            th.append(jnp.where(pos & (in_dim[d] > 0.0), rows[d], 1.0))
        logth = [jnp.log(th[d]) for d in range(D)]

        # prior: a/b tables are 0 beyond each model's dim and th is 1
        # there, so no extra masking is needed (matches the batched XLA
        # kernel's where(in_dim, ...) exactly)
        lp = sum(mks[k] * const_tab[k] for k in range(K))
        for d in range(D):
            a_d = sum(mks[k] * a_tab[k, d] for k in range(K)
                      if a_tab[k, d] != 0.0)
            b_d = sum(mks[k] * b_tab[k, d] for k in range(K)
                      if b_tab[k, d] != 0.0)
            lp = lp + (a_d - 1.0 * in_dim[d]) * logth[d] - b_d * th[d]

        for g in range(G):
            lam = None
            llam = None
            for d in range(D):
                if lam_sets[g][d]:
                    sel = msum(lam_sets[g][d])
                    t1 = sel * th[d]
                    t2 = sel * logth[d]
                    lam = t1 if lam is None else lam + t1
                    llam = t2 if llam is None else llam + t2
            base = sx_g[g] * llam - clg_g[g]
            nb_models = nb_sets[g]
            if len(nb_models) < K:       # some model uses Poisson here
                pois = base - n_g[g] * lam
            if nb_models:
                kap = None
                for d in range(D):
                    if kap_sets[g][d]:
                        sel = msum(kap_sets[g][d])
                        t = sel * th[d]
                        kap = t if kap is None else kap + t
                km1 = 1.0 / jnp.maximum(kap, 1e-30)
                nb = base + n_g[g] * (km1 * jnp.log(km1)
                                      - pal_gammaln(km1)) \
                    - (sx_g[g] + n_g[g] * km1) * jnp.log(lam + km1)
                for v, c in zip(vals_g[g], cnts_g[g]):
                    nb = nb + c * pal_gammaln(v + km1)
            if not nb_models:
                lp = lp + pois
            elif len(nb_models) == K:
                lp = lp + nb
            else:
                is_nb = msum(nb_models)
                lp = lp + jnp.where(is_nb > 0.5, nb, pois)
        return jnp.where(ok, lp, -1e6)

    return batched_cols


@memoized_set
def rb9_set(**kw) -> ModelSet:
    kw.setdefault("batched_logpost", _build_batched_logpost(
        kw.get("dtype", jnp.float32)))
    kw.setdefault("batched_logpost_cols", _build_batched_cols())
    x = jnp.asarray(X_DATA, jnp.float32)
    lgx1 = jnp.asarray(np_gammaln(X_DATA + 1.0), jnp.float32)
    groups = jnp.asarray(GROUPS)

    models = []
    for k in range(10):
        ql, qk = N_LAMBDA[k], N_KAPPA[k]
        dim = ql + qk
        pindic = _pindic(k)
        lam_idx = np.array(_lambda_map(k))
        kap_idx = np.array(_kappa_map(k))

        def logp(theta, ql=ql, qk=qk, pindic=tuple(pindic),
                 lam_idx=lam_idx, kap_idx=kap_idx, dim=dim):
            ok = jnp.all(theta[:dim] > 0.0)         # userrb9.c:79-84
            th = jnp.where(jnp.arange(theta.shape[0]) < dim,
                           jnp.where(theta > 0, theta, 1.0), 1.0)
            # prior (userrb9.c:143-152)
            lp = 0.0
            for i in range(ql):
                lp = lp + (ALPHA1 * np.log(BETA1)
                           + (ALPHA1 - 1.0) * jnp.log(th[i]) - BETA1 * th[i]
                           - float(np_gammaln(ALPHA1)))
            for i in range(ql, ql + qk):
                lp = lp + (ALPHA2 * np.log(BETA2)
                           + (ALPHA2 - 1.0) * jnp.log(th[i]) - BETA2 * th[i]
                           - float(np_gammaln(ALPHA2)))
            # likelihood (userrb9.c:154-179), vectorized per group
            lam_g = th[jnp.asarray(lam_idx)][groups]     # [66]
            kap_g = th[jnp.asarray(kap_idx)][groups]     # [66]
            is_nb = jnp.asarray(np.asarray(pindic, np.float32))[groups]
            pois = -lam_g + x * jnp.log(lam_g) - lgx1
            km1 = 1.0 / kap_g
            nb = (x * jnp.log(lam_g) + gammaln(x + km1) - lgx1
                  + km1 * jnp.log(km1) - gammaln(km1)
                  - (x + km1) * jnp.log(lam_g + km1))
            llh = jnp.sum(jnp.where(is_nb > 0, nb, pois))
            return jnp.where(ok, lp + llh, -1e6)

        # log-normal random inits in the reference (userrb9.c:35-60);
        # deterministic prior-scale points serve the same purpose.
        init = np.empty(dim)
        init[:ql] = 43.87879
        init[ql:] = 2.152937
        models.append(Model(f"rb9_k{k + 1}", dim, logp, init=init))
    return ModelSet(models, **kw)
