"""Keras h5 weight import roundtrip (SURVEY.md §5 checkpoint import path)."""

import numpy as np
import pytest

from ubdvss_tpu import NetConfig, get_model, init_params

keras = pytest.importorskip("keras")

from oracle.keras_model import copy_flax_params_to_keras  # noqa: E402

from ubdvss_tpu.utils.keras_import import (  # noqa: E402
    build_keras_model,
    load_keras_weights,
    params_from_keras_model,
)


def test_roundtrip_flax_keras_flax(tmp_path):
    cfg = NetConfig()
    params = init_params(cfg, 5)
    km = build_keras_model(cfg, (32, 32))
    copy_flax_params_to_keras(params, km, cfg)
    back = params_from_keras_model(km, cfg)
    import jax

    for a, b in zip(jax.tree.leaves(params), jax.tree.leaves(back)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    # through an h5 file on disk (the reference checkpoint format)
    wpath = str(tmp_path / "ref.weights.h5")
    km.save_weights(wpath)
    loaded = load_keras_weights(wpath, cfg)
    x = np.random.default_rng(0).normal(0, 1, (1, 32, 32, 1)).astype(np.float32)
    y1 = np.asarray(get_model(cfg).apply({"params": params}, x))
    y2 = np.asarray(get_model(cfg).apply({"params": loaded}, x))
    np.testing.assert_allclose(y1, y2, atol=1e-6)
