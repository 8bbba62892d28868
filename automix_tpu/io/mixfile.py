"""``_mix.data`` proposal checkpoint: reference-compatible import/export.

The ``_mix.data`` file is the reference's real checkpoint of the adapted
proposal (per-model sig, Lkk, lambda/mu/lower-triangular B); writer
``write_mix_to_file`` (logwrite.c:247-277), reader ``read_mixture_params``
(logwrite.c:27-109), format documented in README.txt:297-307.  CLI mode
``-m 1`` resumes stage 3 from it (main.c:81-87).

This module reads and writes that exact text format so the engine can (a)
resume from a proposal fitted by the C library and (b) produce files the C
driver accepts — the oracle-parity seam named in SURVEY.md section 5.
"""

from __future__ import annotations

from typing import Sequence

import jax.numpy as jnp
import numpy as np

from automix_tpu.ops import linalg
from automix_tpu.state import Proposal


def write_mix_file(path: str, proposal: Proposal, model_dims: Sequence[int],
                   fmt: str = "%.6f"):
    """Serialize a Proposal to the reference text format.

    Dead (annihilated) component slots are compacted out, matching the
    reference's dense Lkk-length arrays.  ``fmt`` defaults to the C writer's
    ``%lf`` (6 decimals, logwrite.c:261-272).
    """
    lam = np.asarray(proposal.lam)
    mu = np.asarray(proposal.mu)
    B = np.asarray(proposal.B)
    sig = np.asarray(proposal.sig)
    K = lam.shape[0]
    lines = [str(K)]
    for k in range(K):
        lines.append(str(int(model_dims[k])))
    for k in range(K):
        d = int(model_dims[k])
        for j in range(d):
            lines.append(fmt % sig[k, j])
        live = np.nonzero(lam[k] > 0)[0]
        lines.append(str(len(live)))
        for l in live:
            lines.append(fmt % lam[k, l])
            for j in range(d):
                lines.append(fmt % mu[k, l, j])
            for i in range(d):
                for j in range(i + 1):
                    lines.append(fmt % B[k, l, i, j])
    with open(path, "w") as f:
        f.write("\n".join(lines) + "\n")


def read_mix_file(path: str, model_dims: Sequence[int], lmax: int,
                  dmax: int, dtype=jnp.float32) -> Proposal:
    """Parse a reference-format mix file into a padded Proposal.

    Applies the same validation as the C reader: model count and dims must
    match, component weights must sum to 1 within 1e-5 and are renormalized
    (logwrite.c:44-58, 92-105).
    """
    with open(path) as f:
        tokens = f.read().split()
    pos = 0

    def next_tok():
        nonlocal pos
        if pos >= len(tokens):
            raise ValueError("end of file encountered before parameters read")
        t = tokens[pos]
        pos += 1
        return t

    K = int(next_tok())
    if K != len(model_dims):
        raise ValueError(
            f"file nmodels {K} contradicts model set ({len(model_dims)})")
    for k in range(K):
        d = int(next_tok())
        if d != int(model_dims[k]):
            raise ValueError(
                f"file dim {d} for model {k} contradicts model set "
                f"({model_dims[k]})")

    lam = np.zeros((K, lmax))
    mu = np.zeros((K, lmax, dmax))
    B = np.tile(np.eye(dmax), (K, lmax, 1, 1))
    sig = np.full((K, dmax), 10.0)
    nmix = np.zeros(K, np.int32)

    for k in range(K):
        d = int(model_dims[k])
        for j in range(d):
            sig[k, j] = float(next_tok())
        Lkk = int(next_tok())
        if Lkk < 1 or Lkk > lmax:
            raise ValueError(f"model {k}: nMixComps {Lkk} out of range 1..{lmax}")
        nmix[k] = Lkk
        for l in range(Lkk):
            lam[k, l] = float(next_tok())
            for j in range(d):
                mu[k, l, j] = float(next_tok())
            for i in range(d):
                for j in range(i + 1):
                    B[k, l, i, j] = float(next_tok())
        s = lam[k, :Lkk].sum()
        if abs(s - 1.0) > 1e-5:
            raise ValueError(
                f"component weights for model {k} sum to {s}, not 1")
        lam[k, :Lkk] /= s

    lam_j = jnp.asarray(lam, dtype)
    mu_j = jnp.asarray(mu, dtype)
    B_j = jnp.asarray(B, dtype)
    dims_j = jnp.asarray(np.asarray(model_dims, np.int32))
    logdetB = jnp.stack([
        jnp.stack([linalg.log_det_tri(B_j[k, l], dims_j[k])
                   for l in range(lmax)])
        for k in range(K)])
    # zero logdet for dead slots (identity tail gives 0 anyway)
    logdetB = jnp.where(lam_j > 0, logdetB, 0.0)
    return Proposal(lam=lam_j, mu=mu_j, B=B_j, logdetB=logdetB,
                    nmix=jnp.asarray(nmix), sig=jnp.asarray(sig, dtype))
