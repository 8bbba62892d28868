"""Model registry tests: padded dispatch, masking, init points."""

import jax
import jax.numpy as jnp
import numpy as np

from automix_tpu.config import NEG_INF
from automix_tpu.model import Model, ModelSet
from automix_tpu.models import builtin
from automix_tpu.models.tutorial import tutorial_set


def test_padded_logpost_dispatch():
    ms = ModelSet([
        Model("a", 1, lambda th: -th[0] ** 2, init=np.array([0.0])),
        Model("b", 2, lambda th: -(th[0] ** 2 + 3 * th[1] ** 2),
              init=np.array([0.0, 0.0])),
    ])
    assert ms.dmax == 2
    theta = jnp.asarray([1.0, 2.0])
    lp0 = float(ms.logpost_padded(jnp.int32(0), theta))
    lp1 = float(ms.logpost_padded(jnp.int32(1), theta))
    assert np.isclose(lp0, -1.0)       # model a ignores the padded coord
    assert np.isclose(lp1, -13.0)


def test_batched_logpost():
    ms = builtin.gamma_beta_set()
    k = jnp.asarray([0, 1, 0, 1], jnp.int32)
    theta = jnp.asarray([[9.0, 2.0], [2.0, 2.0], [7.0, 14.5], [4.5, 5.0]])
    lps = np.asarray(ms.logpost_batch(k, theta))
    assert lps.shape == (4,)
    assert np.all(np.isfinite(lps))


def test_nonfinite_sanitized():
    ms = ModelSet([Model("bad", 1, lambda th: jnp.log(th[0]))])  # nan for th<0
    lp = float(ms.logpost_padded(jnp.int32(0), jnp.asarray([-1.0])))
    assert lp <= NEG_INF * 0.99


def test_out_of_support_rejection_values():
    ms = builtin.beta_sampler_set()
    lp_in = float(ms.logpost_padded(jnp.int32(0), jnp.asarray([0.5])))
    lp_out = float(ms.logpost_padded(jnp.int32(0), jnp.asarray([1.5])))
    assert np.isfinite(lp_in)
    assert lp_out <= NEG_INF * 0.99


def test_init_points_padded():
    ms = tutorial_set()
    pts = np.asarray(ms.init_points(jax.random.PRNGKey(0)))
    assert pts.shape == (3, 2)
    np.testing.assert_allclose(pts[0], [0.5, 0.5])
    np.testing.assert_allclose(pts[2], [9.0, 2.0])


def test_init_points_random_when_missing():
    ms = ModelSet([Model("r", 3, lambda th: -jnp.sum(th ** 2))])
    pts = np.asarray(ms.init_points(jax.random.PRNGKey(1)))
    assert pts.shape == (1, 3)
    assert np.all((pts >= 0.0) & (pts < 1.0))


def test_from_callback():
    def logpost(k, th):
        if k == 0:
            return -th[0] ** 2
        return -jnp.sum(th ** 2)

    ms = ModelSet.from_callback(2, [1, 2], logpost, init=[1.0, 2.0, 3.0])
    assert ms.dims.tolist() == [1, 2]
    np.testing.assert_allclose(np.asarray(ms.models[0].init), [1.0])
    np.testing.assert_allclose(np.asarray(ms.models[1].init), [2.0, 3.0])
    lp = float(ms.logpost_padded(jnp.int32(1), jnp.asarray([1.0, 1.0])))
    assert np.isclose(lp, -2.0)
