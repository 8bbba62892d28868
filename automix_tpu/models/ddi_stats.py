"""Sufficient-statistic DDI likelihood: the 467-patient marginal MVN
collapsed to 15 visit-pattern classes.

The reference evaluates the DDI likelihood by looping all 467 patients and
re-factorizing a <=5x5 marginal covariance per patient per call
(userddi.c:533-670).  But the covariance C_n = W_n V W_n^T + sigma^2 I
depends on the patient only through the random-effects design W_n — and the
DDI trial is *scheduled*: every W_n row is one of 5 fixed visit designs, so
the 467 patients fall into only 15 distinct compacted designs W_c (observed
visit subsets).  Two identities then remove the patient axis entirely:

* Sylvester/Woodbury against the d_re x d_re (2x2/3x3) class matrix
  M_c = sigma^2 * Vinv + G_c,   G_c = W_c^T W_c  (static):

      log det C_n = (S_n - d) log sigma^2 + log det M_c - log det Vinv
      r^T C^{-1} r = sigma^{-2} ( r^T r  -  h^T M_c^{-1} h ),  h = W_c^T r

  (theta parameterizes the *precision* Vinv directly, userddi.c:271-276,
  so M_c needs no matrix inversion to assemble); and

* the alpha-dependence is an exact quadratic: r_n = y_n - X_n alpha, so the
  class statistics  q0_c = sum_n r^T r  and  H_c = sum_n h h^T  are
  quadratic polynomials in alpha with constant coefficient tensors.
  Centering on the global least-squares solution alpha_hat keeps the
  float32 evaluation stable (measured |error| < 0.06 on logp ~ -5e3 even
  at exploration-scale alpha, vs the float64 patient loop).

One evaluation is therefore a [chains, F] x [F, 15*(1+ntri)] matmul of the
quadratic feature vector phi(delta) = [vec(dd^T), d, 1] against a static
table, plus closed-form symmetric 2x2/3x3 adjugate algebra vectorized over
the 15 classes — ~15k flops per chain with no patient axis, versus ~250k
flops and a 512-lane patient sweep for the previous Pallas patient kernel.

Reference: userddi.c:533-670 (the per-patient loop this replaces).
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp


def build_class_tables(design, fixed, Y, vmask, S_counts):
    """Precompute the class sufficient-statistic tables (float64 numpy).

    Returns a dict with: ``alpha_hat`` [n_fix]; ``table`` [F, 15 * (1 +
    ntri)] mapping phi(delta) to per-class (q0, H upper-tri entries);
    ``G`` [15, ntri] class Gram entries; ``N`` / ``s`` [15] class sizes /
    visit counts; ``const`` the -0.5 * sum S_n log 2pi term.
    """
    W = np.asarray(design, np.float64)
    X = np.asarray(fixed, np.float64)
    Y = np.asarray(Y, np.float64)
    vm = np.asarray(vmask, np.float64)
    S = np.asarray(S_counts)
    n_pat, vmax, d_re = W.shape
    n_fix = X.shape[2]

    # classes = distinct compacted designs (observed visit subsets)
    patterns: dict = {}
    for i in range(n_pat):
        patterns.setdefault(tuple(np.round(W[i], 9).ravel()), []).append(i)
    for idxs in patterns.values():
        w0 = W[idxs[0]]
        for i in idxs[1:]:
            assert np.allclose(W[i], w0), "class design mismatch"

    # global least-squares center (float64): zero-residual orthogonality
    # does not hold per class, but |delta| stays O(1) near the posterior,
    # which is what bounds the float32 cancellation error.
    P2g = np.einsum("nvi,nvj->ij", X, X)
    p1g = np.einsum("nvi,nv->i", X, Y * vm)
    alpha_hat = np.linalg.solve(P2g, p1g)

    tri = [(a, b) for a in range(d_re) for b in range(a, d_re)]
    ntri = len(tri)
    # symmetric quadratic features: delta_i delta_j for i <= j (off-diag
    # coefficients folded as T[i,j] + T[j,i]) — 45 instead of 81 rows for
    # n_fix = 9, a ~40% cut of the dominant matmul
    iu = np.triu_indices(n_fix)
    n_quad = len(iu[0])
    F = n_quad + n_fix + 1
    n_cls = len(patterns)
    table = np.zeros((F, n_cls * (1 + ntri)))
    G = np.zeros((n_cls, ntri))
    N = np.zeros(n_cls)
    s_c = np.zeros(n_cls)

    for c, (key, idxs) in enumerate(sorted(patterns.items())):
        Wc = W[idxs[0]]
        N[c] = len(idxs)
        s_c[c] = S[idxs[0]]
        Gc = Wc.T @ Wc
        G[c] = [Gc[a, b] for (a, b) in tri]
        P2 = np.zeros((n_fix, n_fix))
        p1 = np.zeros(n_fix)
        p0 = 0.0
        T2 = np.zeros((ntri, n_fix, n_fix))
        t1 = np.zeros((ntri, n_fix))
        t0 = np.zeros(ntri)
        for i in idxs:
            Xi = X[i]
            rhat = (Y[i] - Xi @ alpha_hat) * vm[i]
            A = Wc.T @ Xi                     # [d_re, n_fix]
            g = Wc.T @ rhat                   # [d_re]
            P2 += Xi.T @ Xi
            p1 += Xi.T @ rhat
            p0 += rhat @ rhat
            for e, (a, b) in enumerate(tri):
                T2[e] += np.outer(A[a], A[b])
                t1[e] += g[a] * A[b] + g[b] * A[a]
                t0[e] += g[a] * g[b]
        # quadratic-in-delta coefficients -> feature table columns:
        # q(delta) = phi(delta) . [sym(Q2)_triu, q1, q0] with phi =
        # [delta_i delta_j (i<=j), delta, 1] and off-diagonal upper-tri
        # coefficients Q2[i,j] + Q2[j,i].
        def sym_rows(Q2):
            Qs = Q2 + Q2.T
            rows = Qs[iu]
            rows[iu[0] == iu[1]] /= 2.0       # diagonal counted once
            return rows

        col = c * (1 + ntri)
        table[:, col] = np.concatenate([sym_rows(P2), -2.0 * p1, [p0]])
        for e in range(ntri):
            table[:, col + 1 + e] = np.concatenate(
                [sym_rows(T2[e]), -t1[e], [t0[e]]])

    const = -0.5 * float(S.sum()) * np.log(2.0 * np.pi)
    return dict(alpha_hat=alpha_hat, table=table, G=G, N=N, s=s_c,
                const=const, d_re=d_re, n_fix=n_fix, ntri=ntri,
                n_cls=n_cls, tri=tri, iu=iu)


def build_llh(tables, dtype=jnp.float32):
    """Batched log-likelihood ``llh(prec_tri [S, ntri], var [S],
    alpha [S, n_fix], log_det_prec [S]) -> [S]`` from the class tables.

    ``prec_tri`` holds the packed upper-triangle of the random-effects
    precision in the same (a, b) a<=b order as the tables' ``tri``.
    Non-positive-definite inputs surface as NaN (log of a non-positive
    class determinant) for the caller's isfinite guard, mirroring the
    reference's rejection (userddi.c:295,381).
    """
    d = tables["d_re"]
    n_fix = tables["n_fix"]
    ntri = tables["ntri"]
    n_cls = tables["n_cls"]
    alpha_hat = jnp.asarray(tables["alpha_hat"], dtype)
    table = jnp.asarray(tables["table"], dtype)
    G = jnp.asarray(tables["G"], dtype)           # [C, ntri]
    N = jnp.asarray(tables["N"], dtype)           # [C]
    sum_sd = float(np.sum(tables["N"] * (tables["s"] - d)))
    const = float(tables["const"])
    # off-diagonal entries count twice in tr(B H)
    tri_w = jnp.asarray([1.0 if a == b else 2.0 for (a, b) in tables["tri"]],
                        dtype)

    def sym_inv_det(M):
        """Adjugate inverse + determinant of symmetric d x d packed as
        [..., ntri] in row-major upper-tri order."""
        if d == 2:
            a, b, c = M[..., 0], M[..., 1], M[..., 2]
            det = a * c - b * b
            inv = jnp.stack([c, -b, a], axis=-1)
            return inv / det[..., None], det
        a, b, c = M[..., 0], M[..., 1], M[..., 2]
        e, f, i = M[..., 3], M[..., 4], M[..., 5]
        A00 = e * i - f * f
        A01 = c * f - b * i
        A02 = b * f - c * e
        det = a * A00 + b * A01 + c * A02
        A11 = a * i - c * c
        A12 = b * c - a * f
        A22 = a * e - b * b
        inv = jnp.stack([A00, A01, A02, A11, A12, A22], axis=-1)
        return inv / det[..., None], det

    iu0 = np.asarray(tables["iu"][0])
    iu1 = np.asarray(tables["iu"][1])
    # split the feature table into quadratic / linear / constant blocks so
    # the evaluation is two matmuls + a broadcast add — a concatenated
    # phi vector costs a full [S, F] materialization per eval (measured
    # ~0.5 ms/sweep of pure concatenate time in the DDI chunk)
    n_quad = len(iu0)
    tab_quad = table[:n_quad]
    tab_lin = table[n_quad:n_quad + n_fix]
    tab_const = jnp.asarray(tables["table"][n_quad + n_fix], dtype)

    # Full-f32 matmul precision: TPU matmuls default to bf16 inputs, and
    # logp here is ~ -5e3 while the decisive model-comparison margin is
    # only a few log units (oracle log-odds -4.4) — bf16 feature products
    # bias logp by O(1) at the mode and worse at exploration scale,
    # enough to invert the DDI model posterior (caught by the PERF
    # parity guard on TPU; CPU f32 matmuls never see this).  The matmul
    # is [S, 55] x [55, 105] — 6 bf16 passes cost nothing at this size.
    _PREC = jax.lax.Precision.HIGHEST

    def llh(prec_tri, var, alpha, log_det_prec):
        S = alpha.shape[0]
        delta = alpha.astype(dtype) - alpha_hat
        phi2 = delta[:, iu0] * delta[:, iu1]              # [S, n_quad]
        stats = (jnp.matmul(phi2, tab_quad, precision=_PREC)
                 + jnp.matmul(delta, tab_lin, precision=_PREC)
                 + tab_const[None, :]).reshape(S, n_cls, 1 + ntri)
        q0 = stats[:, :, 0]                               # [S, C]
        H = stats[:, :, 1:]                               # [S, C, ntri]
        # M_c = var * Vinv + G_c (both symmetric, packed upper-tri)
        M = var[:, None, None] * prec_tri[:, None, :] + G[None, :, :]
        B, detM = sym_inv_det(M)                          # [S, C, ntri], [S, C]
        quad = q0 - jnp.sum(B * H * tri_w, axis=-1)       # [S, C]
        ld = jnp.sum(N[None, :] * jnp.log(detM), axis=1)  # [S]
        return (-0.5 * jnp.sum(quad, axis=1) / var
                - 0.5 * ld
                + 0.5 * float(np.sum(tables["N"])) * log_det_prec
                - 0.5 * sum_sd * jnp.log(var)
                + const)

    return llh
