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


def enable_compilation_cache(path: str | None = None,
                             min_compile_time_secs: float = 1.0) -> str | None:
    """Persist compiled executables to disk so process-cold calls skip XLA.

    The batched classical suite compiles in single-digit seconds when the
    TPU compile service is healthy, but a recovering service (e.g. after an
    OOM-killed compile) can take minutes; the persistent cache makes every
    compile after the first immune to that (PERF.md "cold compile"). Returns
    the cache directory used (default ``~/.cache/mdt-xla``), or ``None`` when
    skipped: the axon tunnel plugin hangs on executable serialization, so the
    cache is only enabled on backends that support it.
    """
    import os

    try:
        version = jax.devices()[0].client.platform_version
    except Exception:
        version = ""
    if "axon" in version:
        return None
    path = path or os.path.join(os.path.expanduser("~"), ".cache", "mdt-xla")
    os.makedirs(path, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", path)
    jax.config.update("jax_persistent_cache_min_compile_time_secs",
                      min_compile_time_secs)
    return path
