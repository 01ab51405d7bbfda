"""Shared parameter fixtures for API tests."""

import numpy as np


def forced_blob_params(cfg):
    """Zeroed weights + positive detection head bias: the whole heatmap
    fires, giving exactly one full-frame component deterministically."""
    import jax

    from ubdvss_tpu import init_params

    params = init_params(cfg, 0)
    params = jax.tree.map(lambda p: p * 0.0, params)
    head_b = np.zeros((cfg.n_output_channels,), np.float32)
    head_b[0] = 5.0
    if cfg.classification:
        head_b[1 + 2] = 3.0
    params["head"]["bias"] = head_b
    return params
