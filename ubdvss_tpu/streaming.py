"""Streaming multi-frame pipeline (BASELINE.json config 5).

Processes a video-like sequence of frames through the fused
preproc→FCN→rect-extraction program with double-buffered device feeding:
while the chip runs batch N, batch N+1 is already being transferred
(JAX async dispatch overlaps H2D copies with compute; results are only
synced one batch behind).  The reference has no streaming path — its
generator feeds fit/predict synchronously (SURVEY.md §3.1).

Throughput-oriented: frames are batched; latency mode = batch_size 1.
"""

from __future__ import annotations

from typing import Iterable, Iterator

import jax
import numpy as np

from ubdvss_tpu.inference import detect_program_batch
from ubdvss_tpu.net_config import NetConfig


class StreamingDetector:
    """Double-buffered frame-sequence detector.

    >>> sd = StreamingDetector(cfg, params, frame_hw=(512, 512), batch_size=8)
    >>> for frame_idx, dets in sd.process(frames):
    ...     ...
    """

    def __init__(
        self,
        cfg: NetConfig,
        params,
        frame_hw: tuple[int, int],
        batch_size: int = 8,
        qparams=None,
        mesh=None,
    ):
        self.cfg = cfg
        self.params = params
        self.frame_hw = frame_hw
        self.batch_size = batch_size
        self.out_hw = cfg.grid_size(*frame_hw)
        self.qparams = qparams  # ops/quant: int8 serving mode
        # data mesh -> each batch is sharded across chips with per-chip
        # fused pipelines (detect_program_batch(mesh=), r5): streaming a
        # camera bank over a fleet from one feed loop
        self.mesh = mesh
        if mesh is not None and batch_size % mesh.devices.size:
            raise ValueError(
                f"batch_size={batch_size} not divisible by the "
                f"{mesh.devices.size}-device data mesh"
            )

    def _launch(self, batch_np: np.ndarray):
        imgs = jax.device_put(batch_np)  # async H2D
        res, _ = detect_program_batch(
            self.params, imgs, self.cfg, self.out_hw, qparams=self.qparams,
            detections_only=True,  # logits output never read on this path
            mesh=self.mesh,
        )  # async dispatch
        return res

    def process(self, frames: Iterable[np.ndarray]) -> Iterator[tuple[int, dict]]:
        """Yield (frame_index, per-frame detection dict) in order.

        The device always has the next batch in flight before the previous
        batch's results are pulled (double buffering).
        """
        it = iter(frames)
        base = 0
        pending: tuple[int, int, dict] | None = None  # (base, count, res)

        def fetch(res: dict) -> dict:
            # issue ALL leaf D2H copies before blocking: device_get walks
            # leaves serially, and on a remote/tunneled device each fetch
            # is a full round trip (~25 ms here) — async-first collapses
            # the dict to one latency instead of n_leaves (measured 8-leaf
            # fetch 45-80 ms -> 27 ms on the axon tunnel)
            for leaf in jax.tree.leaves(res):
                leaf.copy_to_host_async()
            return jax.device_get(res)

        def next_batch():
            buf = []
            for f in it:
                buf.append(np.asarray(f))
                if len(buf) == self.batch_size:
                    break
            if not buf:
                return None
            n_real = len(buf)
            while len(buf) < self.batch_size:  # pad tail batch (static shape)
                buf.append(np.zeros_like(buf[0]))
            return np.stack(buf), n_real

        nb = next_batch()
        while nb is not None:
            batch_np, n_real = nb
            res = self._launch(batch_np)  # in flight
            if pending is not None:
                pbase, pcount, pres = pending
                pres = fetch(pres)  # sync previous batch only
                for i in range(pcount):
                    yield pbase + i, jax.tree.map(lambda a: a[i], pres)
            pending = (base, n_real, res)
            base += n_real
            nb = next_batch()
        if pending is not None:
            pbase, pcount, pres = pending
            pres = fetch(pres)
            for i in range(pcount):
                yield pbase + i, jax.tree.map(lambda a: a[i], pres)
