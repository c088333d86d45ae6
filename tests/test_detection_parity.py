"""Parity tests for the detection/parsing stack vs the reference torch
implementations (random weights through the converter)."""
import numpy as np
import pytest

import jax.numpy as jnp

torch = pytest.importorskip('torch')

from codeformer_tpu.models import ParseNet, RetinaFace
from codeformer_tpu.utils.convert import torch_state_dict_to_flax

from torch_ref import load_facelib_detection


@pytest.fixture(scope='module')
def ref_mods():
    return load_facelib_detection()


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


def _nchw(x):
    return torch.from_numpy(np.transpose(x, (0, 3, 1, 2)).copy())


@pytest.mark.parametrize('network', ['mobile0.25', 'resnet50'])
def test_retinaface_parity(ref_mods, network):
    rf_mod, _ = ref_mods
    t = rf_mod.RetinaFace(network_name=network).eval()
    _randomize(t, seed=1)
    x = np.random.default_rng(2).normal(
        0, 50, (1, 96, 96, 3)).astype(np.float32)
    with torch.no_grad():
        ref_loc, ref_conf, ref_landm = t(_nchw(x))

    m = RetinaFace(network_name=network)
    variables = torch_state_dict_to_flax(t.state_dict())
    loc, conf, landm = m.apply(variables, jnp.asarray(x))

    np.testing.assert_allclose(np.asarray(loc), ref_loc.numpy(),
                               rtol=1e-3, atol=1e-4)
    np.testing.assert_allclose(np.asarray(conf), ref_conf.numpy(),
                               rtol=1e-3, atol=1e-4)
    np.testing.assert_allclose(np.asarray(landm), ref_landm.numpy(),
                               rtol=1e-3, atol=1e-4)


def test_parsenet_parity(ref_mods):
    _, pn_mod = ref_mods
    t = pn_mod.ParseNet(in_size=64, out_size=64, res_depth=3,
                        parsing_ch=19).eval()
    _randomize(t, seed=3)
    x = np.random.default_rng(4).normal(0, 1, (2, 64, 64, 3)).astype(
        np.float32)
    with torch.no_grad():
        ref_mask, ref_img = t(_nchw(x))

    m = ParseNet(in_size=64, out_size=64, res_depth=3, parsing_ch=19)
    variables = torch_state_dict_to_flax(t.state_dict())
    mask, img = m.apply(variables, jnp.asarray(x))

    np.testing.assert_allclose(
        np.asarray(mask), np.transpose(ref_mask.numpy(), (0, 2, 3, 1)),
        rtol=1e-3, atol=1e-4)
    np.testing.assert_allclose(
        np.asarray(img), np.transpose(ref_img.numpy(), (0, 2, 3, 1)),
        rtol=1e-3, atol=1e-4)


def test_parsenet_fullsize_shapes():
    m = ParseNet()
    import jax
    shapes = jax.eval_shape(
        lambda: m.init(jax.random.PRNGKey(0), jnp.zeros((1, 512, 512, 3))))
    out = jax.eval_shape(
        lambda v: m.apply(v, jnp.zeros((1, 512, 512, 3))), shapes)
    assert out[0].shape == (1, 512, 512, 19)
    assert out[1].shape == (1, 512, 512, 3)
