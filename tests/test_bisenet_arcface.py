"""Parity tests for BiSeNet and ResNetArcFace vs the reference torch
implementations."""
import numpy as np
import pytest

import jax.numpy as jnp

torch = pytest.importorskip('torch')

from codeformer_tpu.models.bisenet import BiSeNet
from codeformer_tpu.models.arcface import ResNetArcFace
from codeformer_tpu.utils.convert import torch_state_dict_to_flax

from torch_ref import REF, _fake_basicsr, _fake_torchvision, _load


def _randomize(module, seed=0):
    g = torch.Generator().manual_seed(seed)
    with torch.no_grad():
        for p in module.parameters():
            p.normal_(0, 0.05, generator=g)
        for name, b in module.named_buffers():
            if name.endswith('running_mean'):
                b.normal_(0, 0.05, generator=g)
            elif name.endswith('running_var'):
                b.uniform_(0.5, 1.5, generator=g)


def test_bisenet_parity():
    import sys
    _fake_basicsr()
    _fake_torchvision()
    if REF not in sys.path:
        sys.path.insert(0, REF)
    from facelib.parsing.bisenet import BiSeNet as TorchBiSeNet
    t = TorchBiSeNet(num_class=19).eval()
    _randomize(t, 0)
    x = np.random.default_rng(1).normal(0, 1, (1, 64, 64, 3)).astype(
        np.float32)
    with torch.no_grad():
        ref_out, ref16, ref32 = t(torch.from_numpy(
            x.transpose(0, 3, 1, 2).copy()))

    m = BiSeNet(num_class=19)
    variables = torch_state_dict_to_flax(t.state_dict())
    out, out16, out32 = m.apply(variables, jnp.asarray(x))
    for ours, theirs in ((out, ref_out), (out16, ref16), (out32, ref32)):
        np.testing.assert_allclose(
            np.asarray(ours), theirs.numpy().transpose(0, 2, 3, 1),
            rtol=1e-3, atol=1e-3)


def test_arcface_parity():
    arc = _load('basicsr.archs.arcface_arch',
                f'{REF}/basicsr/archs/arcface_arch.py')
    t = arc.ResNetArcFace('IRBlock', (2, 2, 2, 2), use_se=True).eval()
    _randomize(t, 2)
    x = np.random.default_rng(3).normal(0, 1, (2, 128, 128, 1)).astype(
        np.float32)
    with torch.no_grad():
        ref = t(torch.from_numpy(x.transpose(0, 3, 1, 2).copy()))
    m = ResNetArcFace('IRBlock', (2, 2, 2, 2), use_se=True)
    variables = torch_state_dict_to_flax(t.state_dict())
    out = m.apply(variables, jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(out), ref.numpy(), rtol=1e-3,
                               atol=1e-3)
