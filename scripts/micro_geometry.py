#!/usr/bin/env python
"""Microbenchmark: the Pallas geometry phase (CCL + roots/slots/extremes).

Scalar-chained timing (block_until_ready can be lazily elided on the
tunneled backend — see bench.py).  Used in r5 to decompose the geometry
phase and prove it compute-bound (see _slots_kernel's docstring for the
measured conclusions); env MK overrides K (default 16) to separate the
per-round cost (K=1 vs K=16) from the CCL fixpoint + fixed overheads.

Run from the repo root: python scripts/micro_geometry.py
"""
import os
import sys
import time
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
from ubdvss_tpu.ops.pallas.postproc_kernel import component_slots_from_logits

B, H, W, K = 512, 128, 128, int(os.environ.get("MK","16"))
rng = np.random.default_rng(0)
det = np.full((B, H, W), -6.0, np.float32)
for b in range(B):
    for _ in range(rng.integers(2, 6)):
        y, x = rng.integers(8, H-24, 2)
        det[b, y:y+12, x:x+16] = 6.0
det = jnp.asarray(det)

@jax.jit
def step(d, s):
    r = component_slots_from_logits(d + (s * 0.0), max_components=K)
    return s + r["rootvals"].sum().astype(jnp.float32)

s = jnp.float32(0)
s = step(det, s); float(s)
for trial in range(3):
    t0 = time.perf_counter(); s0 = s
    for _ in range(20):
        s = step(det, s)
    float(s)
    dt = (time.perf_counter() - t0) / 20
    print(f"trial {trial}: {dt*1e3:.2f} ms/batch")
