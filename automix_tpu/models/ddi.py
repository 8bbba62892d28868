"""DDI AIDS clinical-trial model choice (thesis section 5.5.4, Han & Carlin
2001).

Re-derivation of ``userddi.c``: two longitudinal random-effects models for
467 patients' sqrt-CD4 counts over up to 5 visits.

* Model 0 (dim 16): fixed effects alpha[9], the lower triangle of the 3x3
  random-effects precision V^-1 (6 entries, packed at theta[9+j(j+1)/2+i],
  userddi.c:271-276), and error variance sigma^2 at theta[15].
* Model 1 (dim 10): gamma[6], the 2x2 precision U^-1 (3 entries), tau^2.

Priors (userddi.c:471-531): independent Normals on the fixed effects,
Wishart(rho=24, R) on the precision, InvGamma(a=3, b=0.005) on the error
variance.  Likelihood (userddi.c:533-670): per-patient marginal MVN with
covariance C_i = W_i V W_i^T + sigma^2 I over the patient's S_i observed
visits (missing visits are compacted out of the bundled design tensors).
Non-positive-definite precisions / variances reject with lp = -1e7
(userddi.c:295, 381).

The C code loops patients and re-factorizes a <=5x5 covariance per patient
per evaluation; here all 467 patients are factorized at once — but
*entry-wise*: the 5x5 covariance, its Cholesky factor, and the solve are
held as 15 separate [467]-shaped arrays (one per lower-triangle entry)
rather than a [467, 5, 5] tensor.  TPU tiling pads trailing [5, 5] axes to
(8, 128) tiles — a 41x memory expansion that OOMs at [chains, 467, 5, 5];
entry-wise layout keeps every array's trailing axis the 467-patient axis,
which tiles cleanly, and vmap over chains adds only the leading axis.
"""

from __future__ import annotations

import os

import numpy as np
import jax
import jax.numpy as jnp
from scipy.special import gammaln as np_gammaln

from automix_tpu.model import Model, ModelSet, memoized_set
from automix_tpu.ops import linalg

_DATA_PATH = os.path.join(os.path.dirname(__file__), "ddi_data.npz")

# hyperparameters (userddi.c:21-29)
A_HYP, B_HYP, RHO = 3.0, 0.005, 24
C0 = np.array([10.0, 0.0, 0.0, 0.0, 0.0, 0.0, -3.0, 0.0, 0.0])
C1 = np.array([10.0, 0.0, 0.0, 0.0, -3.0, 0.0])
D0MIN1 = np.array([0.25, 1.0, 1.0, 100.0, 1.0, 1.0, 1.0, 1.0, 1.0])
D1MIN1 = np.array([0.25, 1.0, 100.0, 1.0, 1.0, 1.0])
R0_DIAG = np.array([4.0, 1.0 / 16.0, 1.0 / 16.0])
R1_DIAG = np.array([4.0, 1.0 / 16.0])
REJECT = -1e7

_LOG_2PI = 1.8378770664093453


def _load_data():
    z = np.load(_DATA_PATH)
    S = z["S"].astype(np.int32)
    counts = z["counts"]
    n, vmax = counts.shape
    visit_mask = (np.arange(vmax)[None, :] < S[:, None])
    # Observed responses: sqrt counts, compacted per patient like the C's
    # Y[i][j] < 90 filter (userddi.c:593-599; sentinel 9999 -> ~100).
    Y = np.zeros((n, vmax))
    for i in range(n):
        vals = np.sqrt(counts[i][np.sqrt(counts[i]) < 90.0])
        assert len(vals) == S[i], (i, len(vals), S[i])
        Y[i, : S[i]] = vals
    # Zero the padded rows of the design tensors (the header stores -10
    # sentinels there).
    W = z["W"] * visit_mask[:, :, None]
    X = z["X"] * visit_mask[:, :, None]
    Q = z["Q"] * visit_mask[:, :, None]
    P = z["P"] * visit_mask[:, :, None]
    return dict(S=S, Y=Y, W=W, X=X, Q=Q, P=P, visit_mask=visit_mask)


def _wishart_const(d: int, r_diag):
    """Constant part of the Wishart log-density (userddi.c:493-498):
    -(rho/2) log(rho^-d det R^-1) - (rho d/2) log 2 - (d(d-1)/4) log pi
    - sum_j loggamma((rho - j)/2)."""
    det_rmin1 = float(np.prod(1.0 / r_diag))
    c = -(RHO / 2.0) * np.log(RHO ** (-d) * det_rmin1)
    c -= (RHO * d / 2.0) * np.log(2.0)
    c -= (d * (d - 1) / 4.0) * np.log(np.pi)
    for j in range(d):
        c -= float(np_gammaln((RHO - j) / 2.0))
    return c


def _tri_unpack(vals, d):
    """Symmetric matrix from packed lower-triangle values (userddi.c:271-276)."""
    m = jnp.zeros((d, d), vals.dtype)
    idx = 0
    for j1 in range(d):
        for j2 in range(j1 + 1):
            m = m.at[j1, j2].set(vals[idx])
            m = m.at[j2, j1].set(vals[idx])
            idx += 1
    return m


def _make_logp(data, design, fixed, d_re, n_fix, c_prior, dmin1, r_diag,
               var_idx, re_off, dtype=jnp.float32):
    """Common log-posterior for both DDI models.

    design: [467, 5, d_re] random-effects design (W or Q);
    fixed: [467, 5, n_fix] fixed-effects design (X or P).
    """
    S = jnp.asarray(data["S"])
    Y = jnp.asarray(data["Y"], dtype)
    vmask = jnp.asarray(data["visit_mask"], dtype)
    Xd = jnp.asarray(fixed, dtype)
    n_pat_np, vmax_np = data["Y"].shape
    # Static Gram design tensor: the marginal covariance entries are
    # C[n, (a,b)] = sum_{r,u} W[n,a,r] W[n,b,u] V[r,u], linear in the
    # chain-dependent V.  Folding the W outer products into a constant
    # G [(n, pair), d_re^2] turns the per-chain covariance assembly into
    # one [chains, d_re^2] x [d_re^2, n*pairs] MXU matmul instead of 15
    # per-pair einsums (the dominant cost of the entry-wise layout).
    pairs = [(a, b) for a in range(vmax_np) for b in range(a + 1)]
    W_np = np.asarray(design, np.float64)
    G_np = np.stack([
        (W_np[:, a, :, None] * W_np[:, b, None, :]).reshape(n_pat_np, -1)
        for (a, b) in pairs], axis=1)               # [n, P, d_re^2]
    n_pairs = len(pairs)
    G_flat = jnp.asarray(G_np.reshape(n_pat_np * n_pairs, -1).T, dtype)
    vmask_np = np.asarray(data["visit_mask"], np.float64)
    valid_np = np.stack([vmask_np[:, a] * vmask_np[:, b] for (a, b) in pairs],
                        axis=1)                     # [n, P]
    isdiag_np = np.array([1.0 if a == b else 0.0 for (a, b) in pairs])
    valid_p = jnp.asarray(valid_np, dtype)
    isdiag = jnp.asarray(isdiag_np, dtype)
    pair_col = {ab: p for p, ab in enumerate(pairs)}
    c_prior = jnp.asarray(c_prior, dtype)
    dmin1 = jnp.asarray(dmin1, dtype)
    r_diag_j = jnp.asarray(r_diag, dtype)
    wish_const = _wishart_const(d_re, r_diag)
    norm_const = 0.5 * float(np.sum(np.log(dmin1))) \
        - (n_fix / 2.0) * np.log(2.0 * np.pi)
    ig_const = -A_HYP * np.log(B_HYP) - float(np_gammaln(A_HYP))
    n_pat, vmax = Y.shape

    def logp(theta):
        fixed_fx = theta[:n_fix]
        ntri = d_re * (d_re + 1) // 2
        prec = _tri_unpack(theta[re_off: re_off + ntri], d_re)   # V^-1 / U^-1
        var = theta[var_idx]                                     # sigma^2/tau^2

        ok = var > 0.0
        vsafe = jnp.where(ok, var, 1.0)

        # posdef check + matrix sqrt of the precision (userddi.c:355-414)
        L = jnp.linalg.cholesky(prec)
        posdef = jnp.all(jnp.isfinite(L))
        Lsafe = jnp.where(posdef, jnp.nan_to_num(L, nan=0.0),
                          jnp.eye(d_re, dtype=dtype))
        # V = (L^-1)^T (L^-1) (userddi.c:416-469)
        Linv = jax.scipy.linalg.solve_triangular(
            Lsafe, jnp.eye(d_re, dtype=dtype), lower=True)
        V = Linv.T @ Linv
        log_det_prec = 2.0 * jnp.sum(jnp.log(jnp.abs(jnp.diagonal(Lsafe))))

        # prior (userddi.c:471-531)
        lp = norm_const - 0.5 * jnp.sum(
            (fixed_fx - c_prior) ** 2 * dmin1)
        lp = lp + ((RHO - d_re - 1.0) / 2.0) * log_det_prec
        lp = lp - 0.5 * RHO * jnp.sum(r_diag_j * jnp.diagonal(prec))
        lp = lp + wish_const
        lp = lp + (-(A_HYP + 1.0) * jnp.log(vsafe) - 1.0 / (B_HYP * vsafe)
                   + ig_const)

        # likelihood: marginal MVN over all patients, entry-wise (see
        # module docstring for the TPU tiling rationale).
        # All covariance entries at once: C_all[n, p] = G[n, p, :] . vec(V)
        # (+ var on the valid diagonal; identity on padded visits).
        c_all = (V.reshape(-1) @ G_flat).reshape(n_pat, n_pairs)
        # diag entries get +var when valid and identity-1 when padded;
        # off-diag entries are zeroed when padded.
        c_all = (c_all + var * isdiag[None, :]) * valid_p \
            + (1.0 - valid_p) * isdiag[None, :]
        C = {ab: c_all[:, p] for ab, p in pair_col.items()}
        # unrolled Cholesky on the entries (cf. automix.c:1682-1701),
        # division-free: one rsqrt per pivot replaces the sqrt + the
        # divisions by L_aa in both the column scaling and the solve, and
        # the log-determinant is one log of the pivot product instead of
        # vmax logs — the entrywise pipeline is VPU-transcendental-bound.
        L = {}
        rdiag = []
        pivs = []
        for a in range(vmax):
            s = C[(a, a)]
            for t in range(a):
                s = s - L[(a, t)] * L[(a, t)]
            ra = jax.lax.rsqrt(s)
            rdiag.append(ra)
            L[(a, a)] = s * ra
            pivs.append(s)
            for b in range(a + 1, vmax):
                s2 = C[(b, a)]
                for t in range(a):
                    s2 = s2 - L[(b, t)] * L[(a, t)]
                L[(b, a)] = s2 * ra
        lik_ok = jnp.all(jnp.stack(
            [jnp.all(jnp.isfinite(r)) for r in rdiag]))
        # forward substitution + quadratic form + log-determinant
        mu = jnp.einsum("nvf,f->nv", Xd, fixed_fx)
        resid = (Y - mu) * vmask
        w = []
        quad = 0.0
        for a in range(vmax):
            s = resid[:, a]
            for t in range(a):
                s = s - L[(a, t)] * w[t]
            wa = s * rdiag[a]
            w.append(wa)
            quad = quad + wa * wa
        # log-determinant from pairwise pivot products: one product over
        # all pivots (scale ~ var each) overflows float32 when the error
        # variance is large during exploration; pairs stay finite while
        # still halving the log count vs a per-pivot sum.
        ld2 = 0.0
        for a in range(0, vmax - 1, 2):
            ld2 = ld2 + jnp.log(pivs[a] * pivs[a + 1])
        if vmax % 2:
            ld2 = ld2 + jnp.log(pivs[-1])
        logdet = 0.5 * ld2                  # pivots s_a = L_aa^2
        sdim = S.astype(dtype)
        llh = jnp.sum(-0.5 * quad - 0.5 * sdim * _LOG_2PI - logdet)

        good = ok & posdef & lik_ok
        llh = jnp.where(jnp.isfinite(llh), llh, REJECT)
        return jnp.where(good, lp + llh, REJECT)

    return logp


def _make_batched_logpost(data, dtype):
    """Fast batched log-posterior ``(k [S], theta [S, 16]) -> [S]``.

    The likelihood is the sufficient-statistic class form
    (models/ddi_stats.py): one [S, F] x [F, 15*(1+ntri)] matmul of the
    quadratic alpha-features against a static table plus closed-form
    2x2/3x3 Woodbury algebra vectorized over the 15 visit-pattern classes
    — no patient axis at all.  The chain-dependent prep stays in plain
    JAX, batched and closed-form: positive-definiteness via leading
    principal minors (Sylvester) and the same prior expressions as the
    scalar path.  Both models are evaluated for every chain (the dense-
    batch contract of ModelSet.logpost_batch) and selected by k.
    """
    from automix_tpu.models import ddi_stats

    tab0 = ddi_stats.build_class_tables(
        data["W"], data["X"], data["Y"], data["visit_mask"], data["S"])
    tab1 = ddi_stats.build_class_tables(
        data["Q"], data["P"], data["Y"], data["visit_mask"], data["S"])
    llh0 = ddi_stats.build_llh(tab0, dtype=dtype)
    llh1 = ddi_stats.build_llh(tab1, dtype=dtype)

    def prior_common(fx, c_prior, dmin1, r_diag_diag, log_det_prec, var,
                     d_re, n_fix, wish_const):
        norm_const = 0.5 * float(np.sum(np.log(np.asarray(dmin1)))) \
            - (n_fix / 2.0) * np.log(2.0 * np.pi)
        ig_const = -A_HYP * np.log(B_HYP) - float(np_gammaln(A_HYP))
        ok = var > 0.0
        vsafe = jnp.where(ok, var, 1.0)
        lp = norm_const - 0.5 * jnp.sum(
            (fx - jnp.asarray(c_prior, dtype)) ** 2
            * jnp.asarray(dmin1, dtype), axis=1)
        lp = lp + ((RHO - d_re - 1.0) / 2.0) * log_det_prec
        lp = lp - 0.5 * RHO * r_diag_diag
        lp = lp + wish_const
        lp = lp + (-(A_HYP + 1.0) * jnp.log(vsafe) - 1.0 / (B_HYP * vsafe)
                   + ig_const)
        return lp, ok

    wish0 = _wishart_const(3, R0_DIAG)
    wish1 = _wishart_const(2, R1_DIAG)
    r0 = jnp.asarray(R0_DIAG, dtype)
    r1 = jnp.asarray(R1_DIAG, dtype)

    def model0(theta):
        fx = theta[:, :9]
        a, b, c = theta[:, 9], theta[:, 10], theta[:, 11]
        d, e, f = theta[:, 12], theta[:, 13], theta[:, 14]
        var = theta[:, 15]
        m2 = a * c - b * b
        det = a * (c * f - e * e) - b * (b * f - e * d) + d * (b * e - c * d)
        posdef = (a > 0.0) & (m2 > 0.0) & (det > 0.0)
        dsafe = jnp.where(posdef, det, 1.0)
        log_det_prec = jnp.log(dsafe)
        rdd = r0[0] * a + r0[1] * c + r0[2] * f
        lp, ok = prior_common(fx, C0, D0MIN1, rdd, log_det_prec, var,
                              3, 9, wish0)
        vsafe = jnp.where(ok, var, 1.0)
        # packed upper-tri of the precision in the tables' (a<=b) order:
        # theta packs the lower triangle row-wise (userddi.c:271-276)
        prec_tri = jnp.stack([a, b, d, c, e, f], axis=1)
        llh = llh0(prec_tri, vsafe, fx, log_det_prec)
        good = ok & posdef & jnp.isfinite(llh)
        return jnp.where(good, lp + llh, REJECT)

    def model1(theta):
        fx = theta[:, :6]
        a, b, c = theta[:, 6], theta[:, 7], theta[:, 8]
        var = theta[:, 9]
        det = a * c - b * b
        posdef = (a > 0.0) & (det > 0.0)
        dsafe = jnp.where(posdef, det, 1.0)
        log_det_prec = jnp.log(dsafe)
        rdd = r1[0] * a + r1[1] * c
        lp, ok = prior_common(fx, C1, D1MIN1, rdd, log_det_prec, var,
                              2, 6, wish1)
        vsafe = jnp.where(ok, var, 1.0)
        prec_tri = jnp.stack([a, b, c], axis=1)
        llh = llh1(prec_tri, vsafe, fx, log_det_prec)
        good = ok & posdef & jnp.isfinite(llh)
        return jnp.where(good, lp + llh, REJECT)

    def batched_logpost(k, theta_pad):
        theta_pad = theta_pad.astype(dtype)
        lp0 = model0(theta_pad)
        lp1 = model1(theta_pad)
        return jnp.where(k == 0, lp0, lp1)

    return batched_logpost


@memoized_set
def ddi_set(dtype=jnp.float32, fused="auto", **kw) -> ModelSet:
    """``fused``: use the sufficient-statistic batched path
    (models/ddi_stats.py) for the hot loop.  Pure XLA, so "auto" enables
    it on every backend; False keeps the vmapped lax.switch over the
    entry-wise scalar densities (the oracle-verified source of truth,
    used for parity tests and HMC gradients)."""
    data = _load_data()

    logp0 = _make_logp(data, data["W"], data["X"], d_re=3, n_fix=9,
                       c_prior=C0, dmin1=D0MIN1, r_diag=R0_DIAG,
                       var_idx=15, re_off=9, dtype=dtype)
    logp1 = _make_logp(data, data["Q"], data["P"], d_re=2, n_fix=6,
                       c_prior=C1, dmin1=D1MIN1, r_diag=R1_DIAG,
                       var_idx=9, re_off=6, dtype=dtype)

    # Deterministic stage-1 starts at the prior centers (the reference draws
    # random starts near these, userddi.c:52-193): precisions at identity,
    # error variance at 100 (userddi.c:75,142).
    init0 = np.concatenate([C0, [1.0, 0.0, 1.0, 0.0, 0.0, 1.0], [100.0]])
    init1 = np.concatenate([C1, [1.0, 0.0, 1.0], [100.0]])

    if fused == "auto":
        fused = True
    batched = None
    density = None
    if fused:
        batched = _make_batched_logpost(data, dtype)
        # incremental column density for the fused Pallas sweep engine
        # (models/ddi_cols.py); same class tables, cached per-lane stats
        from automix_tpu.models.ddi_cols import DDIFusedDensity
        density = DDIFusedDensity(data)

    return ModelSet([
        Model("ddi_full", 16, logp0, init=init0),
        Model("ddi_reduced", 10, logp1, init=init1),
    ], dtype=dtype, batched_logpost=batched, fused_density=density, **kw)
