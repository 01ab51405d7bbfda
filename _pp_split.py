import time, os, sys
import numpy as np
import jax, jax.numpy as jnp

from ubdvss_tpu import NetConfig, init_params
from ubdvss_tpu.synthetic import SyntheticMarkupReader
from ubdvss_tpu.utils.checkpoint import load_params_npz
from ubdvss_tpu.ops.pallas.context_kernel import fused_model_apply
from ubdvss_tpu.ops.postproc import postprocess_batch_fused
from ubdvss_tpu.ops.pallas.postproc_kernel import (
    component_slots_from_logits, component_stats_from_logits)
from ubdvss_tpu.ops.pallas.rect_kernel import min_area_rect_select, rects_from_selection

B, S, K = 512, 512, 16
cfg = NetConfig(dtype="bfloat16", max_components=K)
params = init_params(cfg, 0)
params = load_params_npz("assets/pretrained_synthetic.npz", params)
params = jax.tree.map(lambda x: x.astype(jnp.bfloat16), params)
reader = SyntheticMarkupReader(n_samples=B, image_hw=(S, S), seed=7, n_objects=(2, 5))
imgs = jnp.asarray(np.stack([reader.sample_at(i).image for i in range(B)]))

@jax.jit
def trunk(imgs):
    x = imgs.astype(jnp.bfloat16)[..., None]
    return fused_model_apply(params, x, cfg, raw_gray=True, act_out=True)

logits = jax.block_until_ready(trunk(imgs))
print("logits", logits.shape, logits.dtype, file=sys.stderr)

def timeit(name, fn, *a, iters=10):
    # scalar-chain
    out = fn(*a)
    acc = jax.tree.leaves(out)[0].sum().astype(jnp.float32)
    float(jax.device_get(acc))
    t0 = time.perf_counter()
    acc = jnp.float32(0)
    for _ in range(iters):
        out = fn(*a)
        acc = acc + jax.tree.leaves(out)[0].sum().astype(jnp.float32)
    float(jax.device_get(acc))
    dt = (time.perf_counter() - t0) / iters
    print(f"{name}: {dt*1e3:.2f} ms/batch", flush=True)
    return dt

det_full = logits[..., 0].astype(jnp.float32)

@jax.jit
def geo_only(d):
    return component_slots_from_logits(d, max_components=K, threshold=cfg.detection_threshold)

@jax.jit
def stats_only(lg):
    return component_stats_from_logits(lg, max_components=K, threshold=cfg.detection_threshold)

@jax.jit
def full_pp(lg):
    return postprocess_batch_fused(lg, cfg)

geo = geo_only(det_full)
@jax.jit
def rect_only(mnx, mxx):
    sel = min_area_rect_select(mnx, mxx, max_points=cfg.max_hull_points)
    return rects_from_selection(sel)

timeit("full postproc", full_pp, logits)
timeit("geometry (CCL+slots kernels)", geo_only, det_full)
timeit("stats (geometry + einsums)", stats_only, logits)
timeit("rect kernel", rect_only, geo["minx"], geo["maxx"])
