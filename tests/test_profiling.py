"""profiling.py helpers: trace capture, stage timers, throughput."""

import glob
import os

import jax
import jax.numpy as jnp
import numpy as np

from automix_tpu import profiling
from automix_tpu.state import RunStats


def test_trace_writes_profile(tmp_path):
    logdir = str(tmp_path / "trace")
    with profiling.trace(logdir):
        jnp.square(jnp.arange(128.0)).block_until_ready()
    files = glob.glob(os.path.join(logdir, "**", "*"), recursive=True)
    assert any(os.path.isfile(f) for f in files), "no trace artifacts"


def test_stage_timer_segments_and_summary():
    t = profiling.StageTimer()
    x = jnp.arange(64.0)
    with t.segment("warm"):
        pass
    with t.segment("compute", sync=jax.jit(jnp.cumsum)(x)):
        pass
    with t.segment("compute"):     # accumulates into the same segment
        pass
    assert set(t.segments) == {"warm", "compute"}
    assert all(v >= 0.0 for v in t.segments.values())
    s = t.summary()
    assert "compute" in s and "%" in s


def test_throughput_from_runstats():
    st = RunStats(2, 3)
    assert profiling.throughput(None) is None
    assert profiling.throughput(st) is None      # no time recorded yet
    st.n_chains = 1000
    st.nsweeps = 50
    st.timesecs_rjmcmc = 2.0
    np.testing.assert_allclose(profiling.throughput(st), 25_000.0)
