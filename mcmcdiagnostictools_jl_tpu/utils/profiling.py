"""Profiling / tracing hooks (SURVEY.md section 5: the aux subsystems the
reference lacks and the TPU build provides).

- :func:`trace` — context manager around ``jax.profiler.trace`` writing a
  TensorBoard-compatible trace of the diagnostics kernels.
- :func:`annotate` — ``jax.named_scope`` pass-through so kernel families show
  up as named regions in profiles.

Example::

    from mcmcdiagnostictools_jl_tpu.utils.profiling import trace
    with trace("/tmp/mdt-trace"):
        mdt.ess_rhat(x)
"""

from __future__ import annotations

import contextlib

import jax


@contextlib.contextmanager
def trace(log_dir: str):
    """Profile everything inside the block to ``log_dir`` (TensorBoard format)."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def annotate(name: str):
    """Named scope for kernel regions (shows up in XLA profiles)."""
    return jax.named_scope(name)
