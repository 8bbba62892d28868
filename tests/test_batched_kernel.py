"""Custom batched log-posterior kernels must agree with the per-model
reference densities (which are themselves oracle-verified)."""

import jax
import jax.numpy as jnp
import numpy as np

from automix_tpu.models.rb9 import rb9_set


def test_rb9_batched_matches_switch():
    ms = rb9_set()
    assert ms._batched_logpost is not None
    rng = np.random.default_rng(0)
    S = 200
    k = jnp.asarray(rng.integers(0, 10, S), jnp.int32)
    theta = np.zeros((S, 5), np.float32)
    dims = ms.dims[np.asarray(k)]
    for i in range(S):
        theta[i, : dims[i]] = rng.gamma(3.0, 10.0, dims[i])
        if rng.random() < 0.1:           # sprinkle out-of-support states
            theta[i, 0] = -1.0
    theta = jnp.asarray(theta)

    batched = np.asarray(ms.logpost_batch(k, theta))
    switch = np.asarray(jax.vmap(ms.logpost_padded)(k, theta))
    valid = np.abs(switch) < 1e5
    np.testing.assert_allclose(batched[valid], switch[valid],
                               rtol=2e-5, atol=2e-3)
    # rejections agree
    np.testing.assert_array_equal(batched < -1e5, switch < -1e5)
