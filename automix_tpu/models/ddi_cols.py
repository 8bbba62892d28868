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
    G_c, adjugate inverse, log-determinants) is recomputed.  (Caching
    the Woodbury pieces too — adjugate-over-det weights + the
    alpha-independent lp terms, so alpha moves skip the class algebra —
    was tried and measured SLOWER on v5e: 65M vs 76M chain-sweeps/s.
    The ~140 extra cache tiles push the VMEM-sized block from 2048 to
    1024 lanes and add accept-blends on every precision move, costing
    more than the saved adjugate arithmetic.  Don't re-add it without
    re-measuring.);
  - the RJ move and the 1-in-10 block move evaluate in full and refresh
    the cache; the kernel additionally refreshes every ``_REFRESH``
    sweeps to bound incremental float32 drift (measured on v5e: after
    6000 production sweeps the carried logp differs from a from-scratch
    recomputation by at most 3.4e-3 on a logp scale of ~3.6e3).

* **Coefficients as immediates.**  The feature tables enter the kernel
  as compile-time scalar immediates in per-column unrolled FMAs — of
  the layouts probed on v5e hardware the only one that is Mosaic-
  compilable, VMEM-compact, AND fast (see the note in the statistics
  section).  The price is a large traced kernel body (~60k equations),
  which Mosaic compiles in about a minute on hardware but XLA:CPU's
  interpret mode cannot digest — so kernel-level DDI tests run on TPU,
  with the density functions themselves exactness-tested everywhere.

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

    # -- sufficient statistics (functions of alpha only) -----------------
    # Per-column unrolled scalar*tile FMAs with the table coefficients as
    # IMMEDIATES: of the layouts probed on v5e hardware, the only one
    # that is simultaneously Mosaic-compilable, VMEM-compact, and fast.
    # ([n_cols,1,1] VMEM table inputs pad each scalar to an (8,128) tile
    # -> ~19 MB of scoped VMEM and an OOM; dynamically indexed SMEM
    # scalar loads serialize at ~280 ns each, 130x slower than
    # immediates.)  Zero coefficients are skipped; columns a coordinate
    # update does not touch are returned as the SAME tile objects so the
    # kernel skips their accept-blends.

    def stats_full(self, rows):
        """Tuple of n_cols per-lane statistic tiles from scratch."""
        delta = [rows[i] - self.alpha_hat[i] for i in range(self.n_fix)]
        phi = [delta[i1] * delta[i2] for (i1, i2) in self.quad_pairs]
        out = []
        for col in range(self.n_cols):
            acc = float(self.tab_const[col]) + 0.0 * rows[0]
            for f in range(len(phi)):
                t = self.tab_quad[f, col]
                if t != 0.0:
                    acc = acc + phi[f] * float(t)
            for i in range(self.n_fix):
                t = self.tab_lin[i, col]
                if t != 0.0:
                    acc = acc + delta[i] * float(t)
            out.append(acc)
        return tuple(out)

    def stats_coord(self, j, rows, old_j, stats):
        """Statistics after only alpha coordinate j changed from old_j to
        rows[j]: only the ~n_fix+1 features containing j contribute."""
        dnew = rows[j] - self.alpha_hat[j]
        dold = old_j - self.alpha_hat[j]
        dd = dnew - dold
        contribs = []                       # (feature row, delta-phi tile)
        for f, (i1, i2) in enumerate(self.quad_pairs):
            if i1 == j and i2 == j:
                contribs.append((self.tab_quad[f], (dnew + dold) * dd))
            elif i1 == j:
                contribs.append((self.tab_quad[f],
                                 (rows[i2] - self.alpha_hat[i2]) * dd))
            elif i2 == j:
                contribs.append((self.tab_quad[f],
                                 (rows[i1] - self.alpha_hat[i1]) * dd))
        lin_row = self.tab_lin[j]
        out = []
        for col in range(self.n_cols):
            acc = stats[col]
            for trow, dphi in contribs:
                if trow[col] != 0.0:
                    acc = acc + dphi * float(trow[col])
            if lin_row[col] != 0.0:
                acc = acc + dd * float(lin_row[col])
            out.append(acc)
        return tuple(out)

    # -- log-posterior from statistics -----------------------------------

    def lp(self, stats, rows):
        """Per-lane log-posterior tile from the cached/fresh statistics
        and the current precision/variance rows.  Out-of-support lanes
        (var <= 0, non-posdef precision) return REJECT, matching the
        XLA batched path (models/ddi.py)."""
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

        # likelihood: per-class Woodbury recombination, unrolled over the
        # 15 classes with the tiny per-class constants (G, N, tri
        # weights) embedded as scalar immediates (ddi_stats.build_llh,
        # division-free via adjugate + reciprocal)
        quad = None
        ld = None
        for ci in range(self.n_cls):
            base = ci * (1 + self.ntri)
            q0 = stats[base]
            H = [stats[base + 1 + e] for e in range(self.ntri)]
            M = [vsafe * prec[e] + float(self.G[ci, e])
                 for e in range(self.ntri)]
            if self.d_re == 2:
                ma, mb, mc = M
                det = ma * mc - mb * mb
                adj = [mc, -mb, ma]
            else:
                ma, mb, mc_, me, mf, mi = M
                a00 = me * mi - mf * mf
                a01 = mc_ * mf - mb * mi
                a02 = mb * mf - mc_ * me
                det = ma * a00 + mb * a01 + mc_ * a02
                adj = [a00, a01, a02,
                       ma * mi - mc_ * mc_,
                       mb * mc_ - ma * mf,
                       ma * me - mb * mb]
            detsafe = jnp.maximum(det, _TINY)
            sH = None
            for e in range(self.ntri):
                term = (float(self.tri_w[e]) * adj[e]) * H[e]
                sH = term if sH is None else sH + term
            quad_c = q0 - sH * (1.0 / detsafe)
            quad = quad_c if quad is None else quad + quad_c
            ldc = float(self.N[ci]) * jnp.log(detsafe)
            ld = ldc if ld is None else ld + ldc
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

    The cache is the flat tuple of 105 model-0 + 60 model-1 per-lane
    statistic tiles; ``n_cache`` is that count, for the kernel's VMEM
    accounting."""

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

    def table_arrays(self, ndim: int):
        return ()           # coefficients are immediates; no kernel inputs

    def full(self, mks, rows, tabs=()):
        s0 = self._m0.stats_full(rows)
        s1 = self._m1.stats_full(rows)
        lp = (mks[0] * self._m0.lp(s0, rows)
              + mks[1] * self._m1.lp(s1, rows))
        return lp, s0 + s1

    def coord(self, j, mks, rows, old_j, cache, tabs=()):
        n0 = self._m0.n_cols
        c0, c1 = cache[:n0], cache[n0:]
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
        return lp, tuple(s0) + tuple(s1)
