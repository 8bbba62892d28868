"""The tutorial model-choice problem: Normal vs Beta vs Gamma.

Re-derivation of the reference tutorial program (``tutorial.c``,
docs/tutorial.rst): three 2-parameter models explaining ten observations,
with published posterior model probabilities 0.7928 / 0.0239 / 0.1834
(docs/tutorial.rst:255-259) — a primary parity target (BASELINE.md).
"""

from __future__ import annotations

import numpy as np

from automix_tpu.model import Model, ModelSet, memoized_set
from automix_tpu.models.builtin import (_make_params_targets,
                                        _make_params_targets_cols)

# tutorial.c:10-11
TUTORIAL_DATA = np.array([0.2, 0.13, 0.35, 0.17, 0.89,
                          0.33, 0.78, 0.23, 0.54, 0.16])

_logp_normal, _logp_beta, _logp_gamma = _make_params_targets(TUTORIAL_DATA)
_cols_normal, _cols_beta, _cols_gamma = _make_params_targets_cols(
    TUTORIAL_DATA)


@memoized_set
def tutorial_set(**kw) -> ModelSet:
    """ModelSet for the tutorial run (tutorial.c:16-28): inits per
    tutorial.c:19."""
    return ModelSet([
        Model("normal", 2, _logp_normal, init=np.array([0.5, 0.5]),
              logp_cols=_cols_normal),
        Model("beta", 2, _logp_beta, init=np.array([2.0, 2.0]),
              logp_cols=_cols_beta),
        Model("gamma", 2, _logp_gamma, init=np.array([9.0, 2.0]),
              logp_cols=_cols_gamma),
    ], **kw)


# Published reference posteriors (docs/tutorial.rst:255-259).
TUTORIAL_MODEL_PROBS = np.array([0.7928, 0.0239, 0.1834])
