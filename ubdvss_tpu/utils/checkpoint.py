"""Checkpoint save/restore via orbax (SURVEY.md §5 "Checkpoint / resume").

The reference uses Keras ``ModelCheckpoint`` h5 files + ``load_weights``
resume (SURVEY.md §3.5).  Here: orbax checkpoints of the full train state —
params, optimizer state, step counter and data-PRNG key — with
resume-from-latest on restart (the appropriate fault-tolerance scale for
this workload, SURVEY.md §5 "Failure detection").  A ``save_params_npz`` /
``load_params_npz`` pair provides a portable flat-file weight format used
for oracle interchange (the h5-import analog).
"""

from __future__ import annotations

import os
from pathlib import Path
from typing import Any

import jax
import numpy as np
import orbax.checkpoint as ocp


def _abs(path: str | os.PathLike) -> str:
    return str(Path(path).resolve())


class CheckpointManager:
    """Thin orbax CheckpointManager wrapper: save/restore train state."""

    def __init__(
        self,
        directory: str | os.PathLike,
        max_to_keep: int = 3,
        best_metric: str | None = None,
        best_mode: str = "max",
    ):
        """best_metric: keep checkpoints ranked by this metric (passed to
        save(..., metrics=...)) — the reference's ModelCheckpoint
        save-best-only analog; None keeps the most recent ones."""
        opts = dict(max_to_keep=max_to_keep, create=True)
        if best_metric is not None:
            opts["best_fn"] = lambda m: m[best_metric]
            opts["best_mode"] = best_mode
        self._mgr = ocp.CheckpointManager(
            _abs(directory), options=ocp.CheckpointManagerOptions(**opts)
        )

    def save(self, step: int, state: Any, metrics: dict | None = None) -> None:
        self._mgr.save(step, args=ocp.args.StandardSave(state), metrics=metrics)
        self._mgr.wait_until_finished()

    def best_step(self) -> int | None:
        return self._mgr.best_step()

    def latest_step(self) -> int | None:
        return self._mgr.latest_step()

    def restore(self, target: Any, step: int | None = None) -> Any:
        if step is None:
            step = self.latest_step()
        if step is None:
            raise FileNotFoundError("no checkpoint found")
        return self._mgr.restore(step, args=ocp.args.StandardRestore(target))

    def close(self):
        self._mgr.close()


def load_net_config(checkpoint: str | os.PathLike):
    """NetConfig from the ``net_config.json`` sidecar the Trainer writes
    next to its checkpoints, or None if absent.

    Lets evaluate/detect rebuild the exact trained architecture (channels /
    dilations / separable_context / class set) without the CLI having to
    repeat the training flags.  ``checkpoint`` may be the logdir, the
    ``<logdir>/checkpoints`` dir, or an .npz weight file path.
    """
    from ubdvss_tpu.net_config import NetConfig

    p = Path(checkpoint)
    candidates = []
    if p.suffix == ".npz":
        # per-file sidecar first: lets several differently-shaped weight
        # files share one directory (e.g. assets/) without ambiguity
        candidates.append(p.with_suffix(".net_config.json"))
        bases = [p.parent]
    else:
        bases = [p]
    bases.append(bases[0].parent)  # <logdir>/checkpoints -> <logdir>
    candidates.extend(base / "net_config.json" for base in bases)
    for side in candidates:
        if side.is_file():
            return NetConfig.from_json(side.read_text())
    return None


def save_params_npz(path: str | os.PathLike, params: Any, cfg=None) -> None:
    """Portable flat weight file (oracle interchange; h5-import analog).

    With ``cfg`` also writes a ``<stem>.net_config.json`` sidecar so
    evaluate/detect can rebuild the exact architecture from the file alone
    (see load_net_config).
    """
    flat = {
        "/".join(str(k.key) for k in kp): np.asarray(v)
        for kp, v in jax.tree_util.tree_flatten_with_path(params)[0]
    }
    np.savez(path, **flat)
    if cfg is not None:
        Path(path).with_suffix(".net_config.json").write_text(cfg.to_json())


def load_params_npz(path: str | os.PathLike, like: Any) -> Any:
    data = np.load(path)
    leaves_with_path = jax.tree_util.tree_flatten_with_path(like)[0]
    treedef = jax.tree_util.tree_structure(like)
    leaves = []
    for kp, old in leaves_with_path:
        key = "/".join(str(k.key) for k in kp)
        arr = data[key]
        assert arr.shape == old.shape, (key, arr.shape, old.shape)
        leaves.append(arr.astype(old.dtype))
    return jax.tree_util.tree_unflatten(treedef, leaves)
