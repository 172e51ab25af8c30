"""Test configuration: run JAX on a virtual 8-device CPU mesh.

Tests never require TPU hardware; sharding tests use
``xla_force_host_platform_device_count`` so multi-chip layouts are exercised
on CPU, as recommended for JAX multi-device testing.
"""

import os

os.environ.setdefault('YSMR_NO_EDITOR', '1')
os.environ.setdefault('JAX_COMPILATION_CACHE_DIR', '/tmp/jax_cache')
os.environ.setdefault('JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS', '1')

# The environment may pin JAX_PLATFORMS to a hardware backend (e.g. the axon
# TPU plugin registers itself at interpreter start), so env vars alone do not
# reliably select CPU for tests — set the config explicitly before any
# backend initialises.
import jax  # noqa: E402

jax.config.update('jax_platforms', 'cpu')
jax.config.update('jax_num_cpu_devices', 8)

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(42)


@pytest.fixture
def tmp_ini(tmp_path):
    """A default tracking.ini in a temp dir, headless-safe."""
    from ysmr_tpu.config import create_configs
    path = str(tmp_path / 'tracking.ini')
    create_configs(path, open_editor=False)
    return path
