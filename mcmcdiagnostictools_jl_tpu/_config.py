"""Runtime configuration knobs.

``use_pallas_sort`` switches the rank transform's two payload sorts from
``lax.sort`` (XLA's flat bitonic network) to the VMEM-staged Pallas bitonic
kernel (ops/pallas/sort_kernel.py). Off by default; enable on TPU for the
fast path:

    import mcmcdiagnostictools_jl_tpu as mdt
    mdt.config.use_pallas_sort(True)

The flag participates in jit cache keys via the functions that read it (they
are only consulted at trace time).
"""

from __future__ import annotations

_PALLAS_SORT = False


def use_pallas_sort(enabled: bool) -> None:
    global _PALLAS_SORT
    _PALLAS_SORT = bool(enabled)


def pallas_sort_enabled() -> bool:
    return _PALLAS_SORT
