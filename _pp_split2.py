import time, sys, functools
import numpy as np
import jax, jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ubdvss_tpu import NetConfig, init_params
from ubdvss_tpu.synthetic import SyntheticMarkupReader
from ubdvss_tpu.utils.checkpoint import load_params_npz
from ubdvss_tpu.ops.pallas.context_kernel import fused_model_apply
from ubdvss_tpu.ops.pallas import postproc_kernel as ppk
from ubdvss_tpu.ops.pallas.ccl_kernel import _ccl_kernel
from ubdvss_tpu.ops.pallas.rect_kernel import min_area_rect_select

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
det_full = jax.block_until_ready(logits[..., 0].astype(jnp.float32))
H, W = det_full.shape[1], det_full.shape[2]
import math
thr_logit = math.log(0.5 / 0.5)

def timeit(name, fn, *a, iters=10):
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

# --- grouped CCL alone, varying G ---
def ccl_grouped(det, G, budget_mult=1):
    Bn = det.shape[0]
    gap = 8 - (H % 8) if H % 8 else 8
    stacked = jnp.pad(det, ((0,0),(0,gap),(0,0)), constant_values=-jnp.inf
        ).reshape(Bn // G, G * (H + gap), W)
    Hs = G * (H + gap)
    ccl = functools.partial(_ccl_kernel, thr_logit=thr_logit, connectivity=8,
                            max_iters=H + W, run_limit=H)
    return pl.pallas_call(
        ccl, grid=(Bn // G,),
        in_specs=[pl.BlockSpec((1, Hs, W), lambda b: (b,0,0), memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((1, Hs, W), lambda b: (b,0,0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((Bn // G, Hs, W), jnp.int32),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=100*1024*1024),
    )(stacked)

for G in (16, 32, 64):
    try:
        timeit(f"ccl grouped G={G}", jax.jit(functools.partial(ccl_grouped, G=G)), det_full)
    except Exception as e:
        print(f"ccl grouped G={G}: FAILED {type(e).__name__}", flush=True)

# --- full geometry (ccl+slots) for reference ---
geo = jax.jit(lambda d: ppk.component_slots_from_logits(d, max_components=K, threshold=0.5))
gout = geo(det_full)
timeit("geometry total (G=16 ccl + slots)", geo, det_full)

# --- rect kernel with varying max_points ---
mnx = jax.block_until_ready(gout["minx"])
mxx = jax.block_until_ready(gout["maxx"])
for M in (64, 48, 32, 16):
    timeit(f"rect M={M}", jax.jit(functools.partial(
        min_area_rect_select, max_points=M)), mnx, mxx)
