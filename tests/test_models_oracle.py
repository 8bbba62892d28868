"""Pointwise log-posterior parity of every ported model family against the
reference C implementation.

The fixture ``tests/data/logp_oracle.json`` holds (k, theta, lp) triples
evaluated by compiled probes linking the reference's user model files
(usertoy1/usertoy2/usercpt/usercptrs/userrb9/userddi.c).  For the
change-point families the fixture is restricted to states without empty
segments, where the reference's segment walk computes the exact likelihood
(see automix_tpu/models/changepoint.py docstring for the walk defect).
"""

import json
import os

import jax.numpy as jnp
import numpy as np
import pytest

from automix_tpu.models.changepoint import cpt_set, cptrs_set
from automix_tpu.models.ddi import ddi_set
from automix_tpu.models.rb9 import rb9_set
from automix_tpu.models.toy import toy1_set, toy2_set

FIXTURE = os.path.join(os.path.dirname(__file__), "data", "logp_oracle.json")

FAMILIES = {
    "toy1": toy1_set,
    "toy2": toy2_set,
    "cpt": cpt_set,
    "cptrs": cptrs_set,
    "rb9": rb9_set,
    "ddi": ddi_set,
}

# float32 relative tolerance; larger log-magnitudes (cpt ~1e3, ddi ~5e3)
# accumulate proportionally more rounding.
RTOL = {"toy1": 2e-5, "toy2": 2e-5, "cpt": 5e-4, "cptrs": 5e-4,
        "rb9": 5e-5, "ddi": 5e-4}


@pytest.mark.parametrize("family", sorted(FAMILIES))
def test_logp_matches_c_oracle(family):
    entries = json.load(open(FIXTURE))[family]
    assert len(entries) >= 10
    ms = FAMILIES[family]()
    max_rel = 0.0
    for e in entries:
        pad = np.zeros(ms.dmax, np.float64)
        th = np.asarray(e["theta"])
        pad[: len(th)] = th
        got = float(ms.logpost_padded(jnp.int32(e["k"]),
                                      jnp.asarray(pad, jnp.float32)))
        rel = abs(got - e["lp"]) / max(1.0, abs(e["lp"]))
        max_rel = max(max_rel, rel)
    assert max_rel < RTOL[family], f"{family}: max rel err {max_rel:.2e}"
