"""DDI column-form density for the fused Pallas sweep engine.

The DDI heavyweight (dims 16/10, reference userddi.c:45-47) was the one
target still running stage 3 on the XLA engine: its sufficient-statistic
likelihood (models/ddi_stats.py) is one [S, 55] x [55, 105] feature matmul
per evaluation, and a 16-coordinate componentwise sweep makes ~17
evaluations.  Two ideas make the fused DDI sweep cheap:

* **Incremental class statistics.**  The per-class statistics
  ``(q0_c, H_c)`` depend *only* on the fixed effects alpha, and a
  componentwise Metropolis move changes ONE coordinate.  The statistics
  therefore live in VMEM as a cache (a [105, 8, W] array for model 0's
  15 classes x (1+6), [60, ...] for model 1), and

  - an **alpha** coordinate move updates them incrementally: only the
    ~n_fix+1 quadratic features containing coordinate j change, so the
    update is ~11 fused multiply-adds over the whole statistics array;
  - a **precision / error-variance** move leaves them untouched — only
    the closed-form 2x2/3x3 Woodbury recombination (M_c = var*Vinv +
    G_c, adjugate inverse, log-determinants) is recomputed;
  - the RJ move and the 1-in-10 block move evaluate in full and refresh
    the cache; the kernel additionally refreshes every ``_REFRESH``
    sweeps to bound incremental float32 drift.

* **Class/column axes stay array axes.**  Every quantity here keeps its
  class/feature axis as a LEADING array axis over the (8, W) lane tiles
  ([105, 8, W], [15, 6, 8, W], ...), so one jaxpr op covers all classes
  and Mosaic does the tile unrolling — the trace is a few hundred
  equations per evaluation instead of the ~14k a scalar unroll costs
  (which made both XLA-interpret and Mosaic compiles intractable).

Implements the kernel's FusedColsDensity protocol
(kernels/fused.py:make_density).  Reference: userddi.c:533-670
(likelihood), userddi.c:471-531 (priors); the XLA-path equivalent of
every formula is models/ddi.py ``_make_batched_logpost`` /
models/ddi_stats.py ``build_llh`` — parity between the paths is asserted
in tests/test_ddi_fused.py.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp
from scipy.special import gammaln as np_gammaln

from automix_tpu.config import NEG_INF
from automix_tpu.models import ddi_stats
from automix_tpu.models.ddi import (A_HYP, B_HYP, C0, C1, D0MIN1, D1MIN1,
                                    R0_DIAG, R1_DIAG, REJECT, RHO,
                                    _wishart_const)

_TINY = 1e-30


class _ModelPart:
    """One DDI model's tables + column-form evaluation pieces."""

    def __init__(self, tables, n_fix, d_re, var_row, prec_rows, c_prior,
                 dmin1, r_diag, wish_const):
        self.n_fix = n_fix
        self.d_re = d_re
        self.ntri = tables["ntri"]
        self.n_cls = tables["n_cls"]
        self.n_cols = self.n_cls * (1 + self.ntri)
        self.var_row = var_row
        self.prec_rows = prec_rows          # rows packing the UPPER tri
        self.alpha_hat = [float(a) for a in tables["alpha_hat"]]
        self.quad_pairs = list(zip(np.asarray(tables["iu"][0]),
                                   np.asarray(tables["iu"][1])))
        n_quad = len(self.quad_pairs)
        tab = np.asarray(tables["table"], np.float32)
        self.tab_quad = tab[:n_quad]                       # [n_quad, cols]
        self.tab_lin = tab[n_quad:n_quad + n_fix]
        self.tab_const = tab[n_quad + n_fix]
        self.G = np.asarray(tables["G"], np.float32)       # [n_cls, ntri]
        self.N = np.asarray(tables["N"], np.float32)
        self.N_tot = float(self.N.sum())
        self.sum_sd = float(np.sum(tables["N"] * (tables["s"] - d_re)))
        self.const = float(tables["const"])
        self.tri_w = np.asarray(
            [1.0 if a == b else 2.0 for (a, b) in tables["tri"]],
            np.float32)
        self.c_prior = [float(v) for v in c_prior]
        self.dmin1 = [float(v) for v in dmin1]
        self.r_diag = [float(v) for v in r_diag]
        self.norm_const = (0.5 * float(np.sum(np.log(np.asarray(dmin1))))
                           - (n_fix / 2.0) * np.log(2.0 * np.pi))
        self.ig_const = float(-A_HYP * np.log(B_HYP) - np_gammaln(A_HYP))
        self.wish_const = wish_const

    def _bc(self, vec, ndim):
        """[n] table constants broadcast over an ndim-dimensional lane
        tile: [n, 1, ..., 1]."""
        v = jnp.asarray(vec, jnp.float32)
        return v.reshape(v.shape + (1,) * ndim)

    # -- sufficient statistics (functions of alpha only) -----------------

    def stats_full(self, rows):
        """[n_cols, *tile] statistics array from scratch."""
        nd = jnp.ndim(rows[0])
        delta = [rows[i] - self.alpha_hat[i] for i in range(self.n_fix)]
        stats = self._bc(self.tab_const, nd) + 0.0 * rows[0][None]
        for f, (i1, i2) in enumerate(self.quad_pairs):
            stats = stats + (delta[i1] * delta[i2])[None] \
                * self._bc(self.tab_quad[f], nd)
        for i in range(self.n_fix):
            stats = stats + delta[i][None] * self._bc(self.tab_lin[i], nd)
        return stats

    def stats_coord(self, j, rows, old_j, stats):
        """Statistics after only alpha coordinate j changed from old_j to
        rows[j]: ~n_fix+2 whole-array fused multiply-adds on the cache."""
        nd = jnp.ndim(rows[0])
        dnew = rows[j] - self.alpha_hat[j]
        dold = old_j - self.alpha_hat[j]
        dd = dnew - dold
        for f, (i1, i2) in enumerate(self.quad_pairs):
            if i1 == j and i2 == j:
                dphi = (dnew + dold) * dd
            elif i1 == j:
                dphi = (rows[i2] - self.alpha_hat[i2]) * dd
            elif i2 == j:
                dphi = (rows[i1] - self.alpha_hat[i1]) * dd
            else:
                continue
            stats = stats + dphi[None] * self._bc(self.tab_quad[f], nd)
        stats = stats + dd[None] * self._bc(self.tab_lin[j], nd)
        return stats

    # -- log-posterior from statistics -----------------------------------

    def lp(self, stats, rows):
        """Per-lane log-posterior tile from the cached/fresh statistics
        and the current precision/variance rows.  Out-of-support lanes
        (var <= 0, non-posdef precision) return REJECT, matching the
        XLA batched path (models/ddi.py)."""
        nd = jnp.ndim(rows[0])
        prec = [rows[r] for r in self.prec_rows]
        var = rows[self.var_row]
        ok = var > 0.0
        vsafe = jnp.where(ok, var, 1.0)

        # leading principal minors (Sylvester) + log det of the precision
        if self.d_re == 2:
            a, b, c = prec
            det_p = a * c - b * b
            posdef = (a > 0.0) & (det_p > 0.0)
            r_dd = self.r_diag[0] * a + self.r_diag[1] * c
        else:
            a, b, d_, c, e, f_ = (prec[0], prec[1], prec[2],
                                  prec[3], prec[4], prec[5])
            # upper-tri order (0,0),(0,1),(0,2),(1,1),(1,2),(2,2)
            m2 = a * c - b * b
            det_p = (a * (c * f_ - e * e) - b * (b * f_ - e * d_)
                     + d_ * (b * e - c * d_))
            posdef = (a > 0.0) & (m2 > 0.0) & (det_p > 0.0)
            r_dd = (self.r_diag[0] * a + self.r_diag[1] * c
                    + self.r_diag[2] * f_)
        dsafe = jnp.where(posdef, det_p, 1.0)
        log_det_prec = jnp.log(dsafe)

        # prior (userddi.c:471-531)
        lp = self.norm_const + 0.0 * var
        for i in range(self.n_fix):
            diff = rows[i] - self.c_prior[i]
            lp = lp - 0.5 * self.dmin1[i] * diff * diff
        lp = lp + ((RHO - self.d_re - 1.0) / 2.0) * log_det_prec
        lp = lp - 0.5 * RHO * r_dd
        lp = lp + self.wish_const
        lp = lp + (-(A_HYP + 1.0) * jnp.log(vsafe)
                   - (1.0 / B_HYP) * (1.0 / vsafe) + self.ig_const)

        # likelihood: per-class Woodbury recombination with the class
        # axis as a leading array axis (ddi_stats.build_llh,
        # division-free via adjugate + reciprocal)
        s = stats.reshape((self.n_cls, 1 + self.ntri) + stats.shape[1:])
        q0 = s[:, 0]                                 # [n_cls, *tile]
        H = s[:, 1:]                                 # [n_cls, ntri, *tile]
        prec_a = jnp.stack(prec)                     # [ntri, *tile]
        M = vsafe[None, None] * prec_a[None] \
            + self._bc(self.G, nd)                   # [n_cls, ntri, *tile]
        if self.d_re == 2:
            ma, mb, mc = M[:, 0], M[:, 1], M[:, 2]
            det = ma * mc - mb * mb
            adj = jnp.stack([mc, -mb, ma], axis=1)
        else:
            ma, mb, mc_ = M[:, 0], M[:, 1], M[:, 2]
            me, mf, mi = M[:, 3], M[:, 4], M[:, 5]
            a00 = me * mi - mf * mf
            a01 = mc_ * mf - mb * mi
            a02 = mb * mf - mc_ * me
            det = ma * a00 + mb * a01 + mc_ * a02
            adj = jnp.stack([a00, a01, a02,
                             ma * mi - mc_ * mc_,
                             mb * mc_ - ma * mf,
                             ma * me - mb * mb], axis=1)
        detsafe = jnp.maximum(det, _TINY)            # [n_cls, *tile]
        wts = self.tri_w.reshape((1, self.ntri) + (1,) * nd)
        sH = jnp.sum(adj * H * wts, axis=1)          # [n_cls, *tile]
        quad = jnp.sum(q0 - sH * (1.0 / detsafe), axis=0)
        ld = jnp.sum(self._bc(self.N, nd) * jnp.log(detsafe), axis=0)
        llh = (-0.5 * quad * (1.0 / vsafe)
               - 0.5 * ld
               + (0.5 * self.N_tot) * log_det_prec
               - (0.5 * self.sum_sd) * jnp.log(vsafe)
               + self.const)

        out = lp + llh
        out = jnp.where(ok & posdef, out, REJECT)
        # sanitize for the kernel's arithmetic blends (make_logpost_cols
        # discipline): clamp infs, map NaN to NEG_INF
        out = jnp.minimum(jnp.maximum(out, NEG_INF), -NEG_INF)
        return jnp.where(out == out, out, NEG_INF)


class DDIFusedDensity:
    """FusedColsDensity for the 2-model DDI family (dims 16 / 10).

    The cache is ``(stats_m0 [105, *tile], stats_m1 [60, *tile])`` —
    ``n_cache`` reports the summed per-lane float32 slot count for the
    kernel's VMEM accounting."""

    def __init__(self, data):
        tab0 = ddi_stats.build_class_tables(
            data["W"], data["X"], data["Y"], data["visit_mask"], data["S"])
        tab1 = ddi_stats.build_class_tables(
            data["Q"], data["P"], data["Y"], data["visit_mask"], data["S"])
        # model 0: theta[9..14] packs the LOWER triangle of the 3x3
        # precision row-wise (userddi.c:271-276): (0,0)(1,0)(1,1)(2,0)
        # (2,1)(2,2) = rows 9,10,11,12,13,14 -> upper-tri (a<=b) order
        # (0,0)(0,1)(0,2)(1,1)(1,2)(2,2) = rows 9,10,12,11,13,14.
        self._m0 = _ModelPart(tab0, n_fix=9, d_re=3, var_row=15,
                              prec_rows=(9, 10, 12, 11, 13, 14),
                              c_prior=C0, dmin1=D0MIN1, r_diag=R0_DIAG,
                              wish_const=_wishart_const(3, R0_DIAG))
        self._m1 = _ModelPart(tab1, n_fix=6, d_re=2, var_row=9,
                              prec_rows=(6, 7, 8),
                              c_prior=C1, dmin1=D1MIN1, r_diag=R1_DIAG,
                              wish_const=_wishart_const(2, R1_DIAG))
        self.n_cache = self._m0.n_cols + self._m1.n_cols
        self.dims = (16, 10)

    def full(self, mks, rows):
        s0 = self._m0.stats_full(rows)
        s1 = self._m1.stats_full(rows)
        lp = (mks[0] * self._m0.lp(s0, rows)
              + mks[1] * self._m1.lp(s1, rows))
        return lp, (s0, s1)

    def coord(self, j, mks, rows, old_j, cache):
        c0, c1 = cache
        # model 0 (dim 16): alpha coords 0..8, precision 9..14, var 15
        s0 = (self._m0.stats_coord(j, rows, old_j, c0) if j < 9 else c0)
        lp = mks[0] * self._m0.lp(s0, rows)
        # model 1 (dim 10): alpha 0..5, precision 6..8, var 9; coords
        # >= 10 are outside the model — its lanes' moves are masked
        # inactive in the kernel, so its lp contribution is simply 0 and
        # its cache passes through untouched.
        if j < 10:
            s1 = (self._m1.stats_coord(j, rows, old_j, c1) if j < 6 else c1)
            lp = lp + mks[1] * self._m1.lp(s1, rows)
        else:
            s1 = c1
        return lp, (s0, s1)
