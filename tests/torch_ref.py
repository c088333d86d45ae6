"""Load the reference PyTorch model definitions standalone for parity tests.

The reference package (basicsr) has a heavy import chain (torchvision, lpips,
...) that isn't available here, so we materialize only the two arch modules
we need, backed by a minimal fake `basicsr` package. The reference tree is
read-only and never modified.
"""
import importlib.util
import logging
import sys
import types

REF = '/root/reference'


def _fake_basicsr():
    if 'basicsr' in sys.modules:
        return
    basicsr = types.ModuleType('basicsr')
    utils = types.ModuleType('basicsr.utils')
    utils.get_root_logger = lambda *a, **k: logging.getLogger('ref')
    registry_mod = types.ModuleType('basicsr.utils.registry')

    class _Reg:
        def register(self, *a, **k):
            def deco(x):
                return x
            return deco

        def get(self, name):
            raise KeyError(name)

    registry_mod.ARCH_REGISTRY = _Reg()
    utils.registry = registry_mod
    archs = types.ModuleType('basicsr.archs')
    sys.modules['basicsr'] = basicsr
    sys.modules['basicsr.utils'] = utils
    sys.modules['basicsr.utils.registry'] = registry_mod
    sys.modules['basicsr.archs'] = archs
    basicsr.utils = utils
    basicsr.archs = archs


def _load(name: str, path: str):
    if name in sys.modules:
        return sys.modules[name]
    spec = importlib.util.spec_from_file_location(name, path)
    mod = importlib.util.module_from_spec(spec)
    sys.modules[name] = mod
    spec.loader.exec_module(mod)
    return mod


def load_reference_archs():
    """Returns (vqgan_arch_module, codeformer_arch_module) from the
    reference repository, importable without torchvision/lpips."""
    _fake_basicsr()
    vqgan = _load('basicsr.archs.vqgan_arch',
                  f'{REF}/basicsr/archs/vqgan_arch.py')
    codeformer = _load('basicsr.archs.codeformer_arch',
                       f'{REF}/basicsr/archs/codeformer_arch.py')
    return vqgan, codeformer
