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
import pytest

jax.config.update('jax_platforms', 'cpu')
jax.config.update('jax_platform_name', 'cpu')
# persistent compile cache: the mesh GAN-step compile alone is ~3min of
# CPU; repeat suite runs skip it entirely
jax.config.update('jax_compilation_cache_dir', '/tmp/jax_cache_cpu')
jax.config.update('jax_persistent_cache_min_compile_time_secs', 10.0)
assert jax.default_backend() == 'cpu', (
    f'tests must run on CPU, got {jax.default_backend()}')


def pytest_collection_modifyitems(config, items):
    """Guard against silent test shadowing: a module that defines the
    same test NAME twice only collects the last definition (Python
    rebinding), so the first becomes dead code the suite never runs.
    That happened once (two test_codeformer_parity_production_config
    defs, round 4); fail collection loudly if any module source binds a
    collected test name more than once."""
    import ast
    checked = set()
    for item in items:
        path = getattr(item, 'fspath', None)
        if path is None or str(path) in checked:
            continue
        checked.add(str(path))
        try:
            tree = ast.parse(open(str(path)).read())
        except (OSError, SyntaxError):
            continue
        seen, dupes = set(), set()
        for node in ast.walk(tree):
            if isinstance(node, (ast.FunctionDef, ast.AsyncFunctionDef)) \
                    and node.name.startswith('test'):
                if node.name in seen:
                    dupes.add(node.name)
                seen.add(node.name)
        if dupes:
            raise pytest.UsageError(
                f'{path}: duplicate test definitions shadow earlier '
                f'ones (only the last runs): {sorted(dupes)}')
