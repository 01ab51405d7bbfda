"""Tracing / profiling hooks (SURVEY.md §5 "Tracing / profiling").

The reference has nothing beyond TensorBoard timing callbacks; here:
`jax.profiler` trace capture around training/benchmark sections (perfetto-
compatible dumps) and a profiler server for on-demand capture.  Stage-level
`jax.named_scope` annotations are applied by callers (e.g. train_step) so
traces show preproc/FCN/postproc phases.
"""

from __future__ import annotations

import contextlib

import jax


@contextlib.contextmanager
def trace(logdir: str | None):
    """Capture a profiler trace into logdir (no-op when logdir is None).

    View with TensorBoard's profile plugin or ui.perfetto.dev.
    """
    if not logdir:
        yield
        return
    with jax.profiler.trace(logdir):
        yield


def start_server(port: int = 9999):
    """Start the on-demand profiling server (capture via TensorBoard)."""
    return jax.profiler.start_server(port)


annotate = jax.named_scope  # stage annotation decorator/context
