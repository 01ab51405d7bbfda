"""Import weights from the Keras reference implementation.

The reference trains with Keras and checkpoints h5 files (SURVEY.md §3.5);
this module loads such weights into the JAX model so reference-trained
detectors run on TPU unchanged (SURVEY.md §5 "Checkpoint / resume": "an
h5/safetensors import path so weights trained by the Keras oracle can be
loaded for parity tests").

Keras/TensorFlow are imported lazily — they are test/interop dependencies,
never on the compute path.
"""

from __future__ import annotations

from typing import Any

import numpy as np

from ubdvss_tpu.net_config import NetConfig


def build_keras_model(cfg: NetConfig, input_hw=(None, None)):
    """The reference architecture in Keras (also used as the parity oracle,
    tests/oracle/keras_model.py)."""
    import keras

    inp = keras.Input(shape=(*input_hw, 1))
    x = inp
    for i in range(2):
        x = keras.layers.Conv2D(
            cfg.channels, 3, strides=2, padding="same", activation="relu",
            name=f"downscale_{i}",
        )(x)
    for i, d in enumerate(cfg.dilations):
        if cfg.separable_context:
            x = keras.layers.DepthwiseConv2D(
                3, dilation_rate=d, padding="same", use_bias=False,
                name=f"context_{i}_dw",
            )(x)
            x = keras.layers.Conv2D(
                cfg.channels, 1, padding="same", name=f"context_{i}_pw"
            )(x)
        else:
            x = keras.layers.Conv2D(
                cfg.channels, 3, dilation_rate=d, padding="same",
                name=f"context_{i}",
            )(x)
        x = keras.layers.ReLU()(x)
    out = keras.layers.Conv2D(
        cfg.n_output_channels, 1, padding="same", name="head"
    )(x)
    return keras.Model(inp, out)


def params_from_keras_model(model, cfg: NetConfig) -> dict:
    """Keras model (layer names as in build_keras_model) -> flax params."""
    params: dict[str, Any] = {}
    for i in range(2):
        k, b = model.get_layer(f"downscale_{i}").get_weights()
        params[f"downscale_{i}"] = {"kernel": np.asarray(k), "bias": np.asarray(b)}
    for i in range(len(cfg.dilations)):
        if cfg.separable_context:
            (dw,) = model.get_layer(f"context_{i}_dw").get_weights()
            pk, pb = model.get_layer(f"context_{i}_pw").get_weights()
            params[f"context_{i}"] = {
                # keras depthwise (3,3,C,1) -> flax grouped-conv (3,3,1,C)
                "depthwise": {"kernel": np.asarray(dw).transpose(0, 1, 3, 2)},
                "pointwise": {"kernel": np.asarray(pk), "bias": np.asarray(pb)},
            }
        else:
            k, b = model.get_layer(f"context_{i}").get_weights()
            params[f"context_{i}"] = {"kernel": np.asarray(k), "bias": np.asarray(b)}
    k, b = model.get_layer("head").get_weights()
    params["head"] = {"kernel": np.asarray(k), "bias": np.asarray(b)}
    return params


def load_keras_weights(path: str, cfg: NetConfig) -> dict:
    """Load a Keras .h5/.weights.h5/.keras checkpoint into flax params."""
    model = build_keras_model(cfg)
    model.load_weights(path)
    return params_from_keras_model(model, cfg)
