"""Keras/TensorFlow oracle model — the executable stand-in for the reference.

The reference (asmekal/ubdvss) is a Keras implementation of the same
architecture, but its mount was empty (SURVEY.md §0), so parity is defined
against this independently-executed Keras/TF implementation of the surveyed
architecture (SURVEY.md §4.1): heatmaps must match the JAX model to ≤1e-5
(BASELINE.json north_star).

Runs on the TensorFlow backend so the conv arithmetic is computed by a
different stack (TF CPU kernels) than the system under test (XLA).  The
model builder itself is shared with the production import path
(ubdvss_tpu.utils.keras_import); this module adds the flax→keras weight
copy used by the parity tests.
"""

import os

os.environ.setdefault("KERAS_BACKEND", "tensorflow")

import numpy as np  # noqa: E402

from ubdvss_tpu.net_config import NetConfig  # noqa: E402
from ubdvss_tpu.utils.keras_import import build_keras_model  # noqa: E402,F401


def copy_flax_params_to_keras(params: dict, model, cfg: NetConfig):
    """Load flax param pytree into the keras oracle (layout conversion)."""
    for i in range(2):
        p = params[f"downscale_{i}"]
        model.get_layer(f"downscale_{i}").set_weights(
            [np.asarray(p["kernel"]), np.asarray(p["bias"])]
        )
    for i in range(len(cfg.dilations)):
        p = params[f"context_{i}"]
        if cfg.separable_context:
            # flax grouped-conv kernel (3,3,1,C) -> keras depthwise (3,3,C,1)
            dw = np.asarray(p["depthwise"]["kernel"]).transpose(0, 1, 3, 2)
            model.get_layer(f"context_{i}_dw").set_weights([dw])
            model.get_layer(f"context_{i}_pw").set_weights(
                [np.asarray(p["pointwise"]["kernel"]), np.asarray(p["pointwise"]["bias"])]
            )
        else:
            model.get_layer(f"context_{i}").set_weights(
                [np.asarray(p["kernel"]), np.asarray(p["bias"])]
            )
    p = params["head"]
    model.get_layer("head").set_weights([np.asarray(p["kernel"]), np.asarray(p["bias"])])
