"""Heatmap parity: JAX model vs independent Keras/TF oracle ≤1e-5
(BASELINE.json north_star; SURVEY.md §4.1)."""

import numpy as np
import pytest

from ubdvss_tpu import NetConfig, get_model, init_params

keras_model = pytest.importorskip("oracle.keras_model")


@pytest.mark.parametrize(
    "cfg",
    [
        NetConfig(),
        NetConfig(separable_context=False, dilations=(1, 2, 4)),
        NetConfig(classification=False),
    ],
    ids=["default", "nonseparable", "det-only"],
)
def test_heatmap_parity(cfg):
    params = init_params(cfg, 3)
    rng = np.random.default_rng(0)
    # odd spatial dims exercise SAME-padding parity for the strided convs
    for hw in [(64, 64), (60, 92)]:
        x = rng.uniform(-1, 1, (2, *hw, 1)).astype(np.float32)
        ours = np.asarray(get_model(cfg).apply({"params": params}, x))
        km = keras_model.build_keras_model(cfg, hw)
        keras_model.copy_flax_params_to_keras(params, km, cfg)
        theirs = np.asarray(km(x))
        assert ours.shape == theirs.shape
        assert np.max(np.abs(ours - theirs)) <= 1e-5, np.max(np.abs(ours - theirs))
