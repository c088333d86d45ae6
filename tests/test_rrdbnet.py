"""RRDBNet parity vs reference + tiled RealESRGANer seam behavior."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

torch = pytest.importorskip('torch')

from codeformer_tpu.models import RRDBNet
from codeformer_tpu.utils.convert import torch_state_dict_to_flax

from torch_ref import load_rrdbnet


@pytest.mark.parametrize('scale', [2, 4])
def test_rrdbnet_parity(scale):
    mod = load_rrdbnet()
    t = mod.RRDBNet(num_in_ch=3, num_out_ch=3, scale=scale, num_feat=32,
                    num_block=2, num_grow_ch=16).eval()
    x = np.random.default_rng(0).uniform(
        0, 1, (1, 32, 32, 3)).astype(np.float32)
    with torch.no_grad():
        ref = t(torch.from_numpy(x.transpose(0, 3, 1, 2).copy()))
    m = RRDBNet(num_in_ch=3, num_out_ch=3, scale=scale, num_feat=32,
                num_block=2, num_grow_ch=16)
    variables = torch_state_dict_to_flax(t.state_dict())
    out = m.apply(variables, jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(out),
                               ref.numpy().transpose(0, 2, 3, 1),
                               rtol=1e-3, atol=1e-4)


def test_tiled_matches_whole():
    """Tiled output approximates whole-image output: exact only where the
    receptive field fits inside tile_pad (same property as the reference
    tiler, realesrgan_utils.py:100-163), so we check closeness + shape."""
    from codeformer_tpu.pipeline.realesrgan import RealESRGANer
    m = RRDBNet(num_in_ch=3, num_out_ch=3, scale=2, num_feat=32,
                num_block=2, num_grow_ch=16)
    upsampler = RealESRGANer(scale=2, model=m, tile=32, tile_pad=8,
                             allow_random=True, dtype=jnp.float32)
    rng = np.random.default_rng(1)
    img = rng.uniform(0, 1, (48, 56, 3)).astype(np.float32)
    whole = upsampler._process_whole(img)
    tiled = upsampler._process_tiled(img)
    assert whole.shape == tiled.shape == (96, 112, 3)
    diff = np.abs(whole - tiled)
    assert diff.mean() < 0.05, diff.mean()


def test_enhance_uint8_roundtrip():
    from codeformer_tpu.pipeline.realesrgan import RealESRGANer
    m = RRDBNet(num_in_ch=3, num_out_ch=3, scale=2, num_feat=32,
                num_block=2, num_grow_ch=16)
    upsampler = RealESRGANer(scale=2, model=m, tile=0, allow_random=True,
                             dtype=jnp.float32)
    img = (np.random.default_rng(2).uniform(0, 255, (40, 40, 3))
           .astype(np.uint8))
    out, mode = upsampler.enhance(img, outscale=2)
    assert out.shape == (80, 80, 3) and out.dtype == np.uint8
    assert mode == 'RGB'
