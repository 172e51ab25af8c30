"""Test configuration: run JAX on a virtual 8-device CPU mesh.

Tests never require TPU hardware; sharding tests use
``xla_force_host_platform_device_count`` so multi-chip layouts are exercised
on CPU, as recommended for JAX multi-device testing.
"""

import os

os.environ.setdefault('JAX_PLATFORMS', 'cpu')
flags = os.environ.get('XLA_FLAGS', '')
if 'xla_force_host_platform_device_count' not in flags:
    os.environ['XLA_FLAGS'] = (flags + ' --xla_force_host_platform_device_count=8').strip()
os.environ.setdefault('YSMR_NO_EDITOR', '1')
os.environ.setdefault('JAX_COMPILATION_CACHE_DIR', '/tmp/jax_cache')
os.environ.setdefault('JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS', '1')

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
