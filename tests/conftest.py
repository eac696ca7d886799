"""Test configuration: CPU backend, float64 parity mode, 8 virtual devices.

The axon TPU plugin ignores JAX_PLATFORMS, so the CPU device is selected via
``jax_default_device``. Float64 is the parity mode used to validate against
the reference semantics (BASELINE.md: ESS/R-hat/MCSE within 1e-6 of reference
float64); TPU fast mode is float32 and is benchmarked separately.
"""

import os

os.environ.setdefault("XLA_FLAGS", "--xla_force_host_platform_device_count=8")

import jax

jax.config.update("jax_enable_x64", True)
try:
    jax.config.update("jax_default_device", jax.local_devices(backend="cpu")[0])
except RuntimeError:
    pass  # no separate CPU backend registered; already on CPU

# Persistent XLA executable cache: every test computation here targets the
# CPU backend (which supports executable serialization — the axon-tunnel
# hang documented in utils/profiling.enable_compilation_cache only affects
# TPU executables, and none compile in this suite), so after one priming
# run the suite skips ALL compiles. This is most of the wall: the default
# suite drops from ~8 min to under 3 on 2 cores (README "Tests & bench").
_cache_dir = os.path.join(os.path.expanduser("~"), ".cache", "mdt-xla-tests")
os.makedirs(_cache_dir, exist_ok=True)
jax.config.update("jax_compilation_cache_dir", _cache_dir)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.05)

import numpy as np
import pytest


@pytest.fixture
def rng():
    return np.random.default_rng(42)


def ar1(rng, phi, sigma, size):
    """AR(1) chains fixture mirroring the reference test helper
    (test/helpers.jl:4-12): x_t = phi * x_{t-1} + sigma * eps_t."""
    noise = rng.standard_normal(size)
    out = np.empty(size)
    out[0] = noise[0]
    for t in range(1, size[0]):
        out[t] = phi * out[t - 1] + sigma * noise[t]
    return out
