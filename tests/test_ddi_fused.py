"""Parity of the sufficient-statistic DDI likelihood path (models/ddi_stats.py) against the vmapped
lax.switch source of truth (which is itself oracle-verified pointwise in
test_models_oracle.py)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from automix_tpu.models.ddi import ddi_set

INIT0 = np.concatenate([[10, 0, 0, 0, 0, 0, -3, 0, 0],
                        [1, 0, 1, 0, 0, 1], [100.0]])
INIT1 = np.concatenate([[10, 0, 0, 0, -3, 0], [1, 0, 1], [100.0],
                        np.zeros(6)])


def test_fused_matches_switch_path():
    ms_ref = ddi_set(fused=False)
    ms_fused = ddi_set(fused=True)
    assert ms_fused._batched_logpost is not None

    rng = np.random.default_rng(3)
    S = 24
    k = rng.integers(0, 2, S).astype(np.int32)
    theta = np.zeros((S, 16), np.float32)
    for i in range(S):
        theta[i] = (INIT0 if k[i] == 0 else INIT1) \
            + 0.2 * rng.standard_normal(16)
        if i % 7 == 0:          # non-posdef precision -> both must reject
            theta[i, 9 if k[i] == 0 else 6] = -1.0
        if i % 11 == 0:         # negative error variance -> reject
            theta[i, 15 if k[i] == 0 else 9] = -5.0

    kj, tj = jnp.asarray(k), jnp.asarray(theta)
    ref = np.asarray(ms_ref.logpost_batch(kj, tj))
    got = np.asarray(ms_fused.logpost_batch(kj, tj))
    rejected = ref <= -1e6
    np.testing.assert_array_equal(rejected, got <= -1e6)
    rel = np.abs(got - ref)[~rejected] / np.maximum(
        1.0, np.abs(ref)[~rejected])
    assert rel.max() < 5e-4, rel.max()


# --- fused-engine incremental density (models/ddi_cols.py) --------------

def _density_and_set():
    ms = ddi_set(fused=True)
    assert ms.fused_density is not None
    return ms.fused_density, ms


def _random_states(seed, S):
    rng = np.random.default_rng(seed)
    k = rng.integers(0, 2, S).astype(np.int32)
    theta = np.zeros((S, 16), np.float32)
    for i in range(S):
        theta[i] = (INIT0 if k[i] == 0 else INIT1) \
            + 0.2 * rng.standard_normal(16)
        if i % 7 == 0:
            theta[i, 9 if k[i] == 0 else 6] = -1.0
        if i % 11 == 0:
            theta[i, 15 if k[i] == 0 else 9] = -5.0
    return k, theta


def test_density_full_matches_batched_logpost():
    """density.full (unrolled FMA form for the kernel) == the XLA
    sufficient-statistic batched path on random in/out-of-support
    states."""
    density, ms = _density_and_set()
    k, theta = _random_states(5, 48)
    kj, tj = jnp.asarray(k), jnp.asarray(theta)
    mks = [(kj == m).astype(jnp.float32) for m in range(2)]
    rows = [tj[:, d] for d in range(16)]
    lp, cache = density.full(mks, rows)
    assert len(cache) == density.n_cache
    ref = np.asarray(ms.logpost_batch(kj, tj))
    got = np.asarray(lp)
    rejected = ref <= -1e6
    np.testing.assert_array_equal(rejected, got <= -1e6)
    rel = np.abs(got - ref)[~rejected] / np.maximum(
        1.0, np.abs(ref)[~rejected])
    assert rel.max() < 2e-3, rel.max()


def test_density_coord_matches_full_recompute():
    """After a single-coordinate change, coord() (incremental cache
    update) must agree with a from-scratch full() at the new state —
    for every coordinate class (alpha / precision / variance, both
    models)."""
    density, ms = _density_and_set()
    rng = np.random.default_rng(7)
    S = 32
    k = rng.integers(0, 2, S).astype(np.int32)
    theta = np.stack([(INIT0 if ki == 0 else INIT1)
                      + 0.1 * rng.standard_normal(16) for ki in k]) \
        .astype(np.float32)
    kj, tj = jnp.asarray(k), jnp.asarray(theta)
    mks = [(kj == m).astype(jnp.float32) for m in range(2)]
    rows = [tj[:, d] for d in range(16)]
    lp0, cache = density.full(mks, rows)
    for j in range(16):
        delta = 0.05 * rng.standard_normal(S).astype(np.float32)
        new_rows = list(rows)
        new_rows[j] = rows[j] + jnp.asarray(delta)
        lp_inc, cache_inc = density.coord(j, mks, new_rows, rows[j], cache)
        lp_ref, cache_ref = density.full(mks, new_rows)
        # lanes where BOTH models' evaluations are in-support and the
        # lane's own model is active at coordinate j
        li = np.asarray(lp_inc)
        lr = np.asarray(lp_ref)
        dims = np.where(k == 0, 16, 10)
        active = (j < dims) & (lr > -1e6) & (li > -1e6)
        assert np.abs(li - lr)[active].max() < 0.02, (j, np.abs(li - lr)[active].max())
        # cache tiles: incremental update tracks the recompute closely
        for ci, (ca, cb) in enumerate(zip(cache_inc, cache_ref)):
            ca, cb = np.asarray(ca), np.asarray(cb)
            scale = np.maximum(1.0, np.abs(cb))
            assert (np.abs(ca - cb) / scale).max() < 5e-3, (j, ci)


def test_density_coord_identity_skip():
    """Cache tiles untouched by a coordinate move must come back as the
    SAME objects (the kernel relies on this to skip accept-blends)."""
    density, _ = _density_and_set()
    k = np.zeros(8, np.int32)
    theta = np.tile(INIT0.astype(np.float32), (8, 1))
    kj, tj = jnp.asarray(k), jnp.asarray(theta)
    mks = [(kj == m).astype(jnp.float32) for m in range(2)]
    rows = [tj[:, d] for d in range(16)]
    _, cache = density.full(mks, rows)
    # variance move (j=15): NO stats change at all
    new_rows = list(rows)
    new_rows[15] = rows[15] + 1.0
    _, cache2 = density.coord(15, mks, new_rows, rows[15], cache)
    assert all(a is b for a, b in zip(cache2, cache))
    # m0 precision move (j=12): stats untouched for both models
    new_rows = list(rows)
    new_rows[12] = rows[12] + 0.1
    _, cache3 = density.coord(12, mks, new_rows, rows[12], cache)
    assert all(a is b for a, b in zip(cache3, cache))
    # m0 alpha move (j=8): m0 stats change, m1 stats untouched
    new_rows = list(rows)
    new_rows[8] = rows[8] + 0.1
    _, cache4 = density.coord(8, mks, new_rows, rows[8], cache)
    n0 = density._m0.n_cols
    assert any(a is not b for a, b in zip(cache4[:n0], cache[:n0]))
    assert all(a is b for a, b in zip(cache4[n0:], cache[n0:]))


# NOTE: kernel-level DDI checks (compiled-kernel smoke, fused-vs-XLA
# statistical parity at scale, drift bound) run on hardware via
# bench/validate_tpu.py — tests/conftest.py pins the suite to the CPU
# backend, where the ~60k-equation DDI kernel body exceeds XLA:CPU
# interpret compile budgets.  The density formulas themselves are
# exactness-tested above on every backend.
