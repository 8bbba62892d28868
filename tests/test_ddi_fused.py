"""Parity of the sufficient-statistic DDI likelihood path (models/ddi_stats.py) against the vmapped
lax.switch source of truth (which is itself oracle-verified pointwise in
test_models_oracle.py)."""

import jax.numpy as jnp
import numpy as np

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
