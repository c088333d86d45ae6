"""Test configuration: force the CPU backend with 8 virtual devices so
multi-chip sharding paths are exercised without TPU hardware (the TPU
analog of a fake distributed backend).

Note: pytest's import chain pulls in jax before this file runs, so plain
env vars are too late for jax's config defaults — we must set the config
directly (the backend itself is not initialized until first device use,
so this is still early enough). XLA_FLAGS is read at backend init.
"""
import os

_flags = os.environ.get('XLA_FLAGS', '')
if '--xla_force_host_platform_device_count' not in _flags:
    os.environ['XLA_FLAGS'] = (
        _flags + ' --xla_force_host_platform_device_count=8').strip()
os.environ['JAX_PLATFORMS'] = 'cpu'
os.environ['JAX_PLATFORM_NAME'] = 'cpu'

import jax

jax.config.update('jax_platforms', 'cpu')
jax.config.update('jax_platform_name', 'cpu')
# persistent compile cache: the mesh GAN-step compile alone is ~3min of
# CPU; repeat suite runs skip it entirely
jax.config.update('jax_compilation_cache_dir', '/tmp/jax_cache_cpu')
jax.config.update('jax_persistent_cache_min_compile_time_secs', 10.0)
assert jax.default_backend() == 'cpu', (
    f'tests must run on CPU, got {jax.default_backend()}')
