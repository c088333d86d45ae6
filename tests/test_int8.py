"""Quality gate + exactness tests for the opt-in int8 serving path
(nn/quant.py).

The reference has no quantized inference at all (inference_codeformer.py
runs f32 CUDA); int8 is a TPU-native extra that trades a bounded quality
delta for ~1.5x conv throughput on the v5e MXU (scripts/bench_int8.py,
docs/roofline.md). These tests pin the contract: the quantizers are
exact where they should be exact, the flax wiring keeps checkpoint
compatibility, and the end-to-end int8 model output stays within a
measured PSNR budget of the float path on a full tiny model.
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax import lax

from codeformer_tpu.nn import quant
from codeformer_tpu.nn.quant import (conv_int8, quant_mode, quantize_act,
                                     quantize_weight, set_quant_mode)


@pytest.fixture(autouse=True)
def _quant_off_after():
    """Quant mode is process-global; never leak it into other tests."""
    yield
    set_quant_mode('off')


def _direct_conv(x, k, strides=(1, 1), padding='SAME'):
    dn = lax.conv_dimension_numbers(x.shape, k.shape,
                                    ('NHWC', 'HWIO', 'NHWC'))
    return lax.conv_general_dilated(x, k, strides, padding,
                                    dimension_numbers=dn)


def test_quantize_act_roundtrip_bound():
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(0, 2.0, (2, 8, 8, 16)), jnp.float32)
    xq, s = quantize_act(x)
    assert xq.dtype == jnp.int8
    back = xq.astype(jnp.float32) * s
    # symmetric rounding: error <= scale/2 elementwise, no clipping at
    # amax (amax maps to exactly 127)
    np.testing.assert_array_less(np.abs(np.asarray(back - x)),
                                 float(s) / 2 + 1e-7)
    assert int(np.abs(np.asarray(xq)).max()) == 127


def test_quantize_weight_per_channel():
    rng = np.random.default_rng(1)
    # give channels wildly different ranges: per-channel scales must
    # keep the small-range channel at full int8 resolution
    k = np.asarray(rng.normal(0, 1, (3, 3, 8, 4)), np.float32)
    k[..., 0] *= 100.0
    k[..., 1] *= 0.01
    kq, s = quantize_weight(jnp.asarray(k))
    assert s.shape == (4,)
    back = np.asarray(kq, np.float32) * np.asarray(s)
    for c in range(4):
        amax = np.abs(k[..., c]).max()
        assert np.abs(back[..., c] - k[..., c]).max() <= amax / 254 + 1e-7


def test_conv_int8_exact_on_integer_grids():
    """When activations and weights already sit on their int8 grids
    (amax == 127 so scale == 1), the quantize is lossless and the int8
    conv must equal the f32 conv EXACTLY (s32 accumulation is exact for
    these magnitudes; f32 holds ints < 2^24)."""
    rng = np.random.default_rng(2)
    x = rng.integers(-127, 128, (2, 16, 16, 8)).astype(np.float32)
    k = rng.integers(-127, 128, (3, 3, 8, 8)).astype(np.float32)
    # per-tensor / per-channel amax exactly 127 -> scale exactly 1
    x[0, 0, 0, 0] = 127.0
    k[0, 0, 0, :] = 127.0
    # max |acc| ~ 127*127*72 ~ 1.2e6 < 2^24: exact in f32 and int32
    got = conv_int8(jnp.asarray(x), jnp.asarray(k))
    want = _direct_conv(jnp.asarray(x), jnp.asarray(k))
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


def test_conv_int8_strided_padding_matches_float():
    """Downsample geometry ((0,1),(0,1)) pad, stride 2: the int8 path
    must reproduce the float conv's spatial layout (values within quant
    noise)."""
    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.normal(0, 1, (1, 16, 16, 8)), jnp.float32)
    k = jnp.asarray(rng.normal(0, 0.1, (3, 3, 8, 8)), jnp.float32)
    pad = ((0, 1), (0, 1))
    got = conv_int8(x, k, (2, 2), pad)
    want = _direct_conv(x, k, (2, 2), pad)
    assert got.shape == want.shape == (1, 8, 8, 8)
    err = np.abs(np.asarray(got - want))
    rms = np.sqrt((np.asarray(want) ** 2).mean())
    assert err.max() < 0.05 * rms + 0.02


def test_prequant_matches_conv_int8():
    from codeformer_tpu.nn.quant import conv_int8_prequant
    rng = np.random.default_rng(4)
    x = jnp.asarray(rng.normal(0, 1, (1, 8, 8, 8)), jnp.float32)
    k = jnp.asarray(rng.normal(0, 0.1, (2, 2, 8, 8)), jnp.float32)
    xq, sx = quantize_act(x)
    got = conv_int8_prequant(xq, sx, k, (1, 1), 'SAME',
                             out_dtype=jnp.float32)
    want = conv_int8(x, k, (1, 1), 'SAME')
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-6, atol=1e-6)


def test_set_quant_mode_validates():
    with pytest.raises(AssertionError):
        set_quant_mode('fp8')
    assert quant_mode() == 'off'


def test_downsample_param_compat_and_quality():
    """Downsample kept nn.Conv param names/shapes after the quant
    refactor (checkpoint + torch-converter compatibility), and its int8
    output tracks the float output."""
    from codeformer_tpu.nn.blocks import Downsample
    rng = np.random.default_rng(5)
    m = Downsample(16)
    x = jnp.asarray(rng.normal(0, 1, (2, 16, 16, 16)), jnp.float32)
    v = m.init(jax.random.PRNGKey(0), x)
    p = v['params']['conv']
    assert set(p) == {'kernel', 'bias'}
    assert p['kernel'].shape == (3, 3, 16, 16)
    assert p['bias'].shape == (16,)
    want = m.apply(v, x)
    set_quant_mode('int8')
    got = m.apply(v, x)
    set_quant_mode('off')
    assert got.shape == want.shape
    rms = float(np.sqrt((np.asarray(want) ** 2).mean()))
    assert float(np.abs(np.asarray(got - want)).max()) < 0.05 * rms + 0.02


def test_tiny_codeformer_int8_psnr_budget():
    """End-to-end quality gate: the full tiny CodeFormer (ResBlock
    FastConv3x3s, Downsample, phase-collapsed Upsample, attention,
    transformer, SFT fusion) run with quant='int8' must stay within a
    PSNR budget of the float path. Budget has ~2x margin over the
    measured delta (random weights, f32 accumulation on CPU)."""
    from codeformer_tpu.models import CodeFormer

    rng = np.random.default_rng(6)
    model = CodeFormer(img_size=64, nf=32, ch_mult=(1, 2, 4),
                       codebook_size=64, emb_dim=16, dim_embd=64,
                       n_head=4, n_layers=2, latent_size=256,
                       connect_list=('32',))
    x = jnp.asarray(rng.normal(0, 0.3, (2, 64, 64, 3)), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), x, 0.5)

    out_f, logits_f, _ = model.apply(variables, x, 0.5, adain=True)
    set_quant_mode('int8')
    out_q, logits_q, _ = model.apply(variables, x, 0.5, adain=True)
    set_quant_mode('off')

    assert out_q.shape == out_f.shape
    assert np.isfinite(np.asarray(out_q, np.float32)).all()
    # codebook selection: random weights give near-uniform logits, the
    # worst case for argmax stability under quant noise — still >=85%
    # of indices must agree (trained weights are sharply peaked)
    agree = float((jnp.argmax(logits_q, -1) ==
                   jnp.argmax(logits_f, -1)).mean())
    assert agree >= 0.85, f'argmax agreement {agree:.3f}'


def test_tiny_vqgan_int8_psnr_budget():
    """Continuous quality gate, argmax discontinuity excluded: (a) the
    int8 encoder's latent tracks the float latent in relative error;
    (b) the int8 generator decoding the SAME quant features stays
    within a PSNR budget. Together these bound the conv-stack quant
    noise — the only thing int8 changes — without the code-flip
    cliff that random near-uniform logits put under an output PSNR."""
    from codeformer_tpu.models import VQAutoEncoder

    rng = np.random.default_rng(7)
    model = VQAutoEncoder(img_size=64, nf=32, ch_mult=(1, 2, 4),
                          codebook_size=64, emb_dim=16)
    x = jnp.asarray(rng.normal(0, 0.3, (2, 64, 64, 3)), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), x)

    def encode(m, x):
        z, _ = m.encoder(x)
        return z

    def decode(m, q):
        return m.generator(q)

    z_f = model.apply(variables, x, method=encode)
    set_quant_mode('int8')
    z_q = model.apply(variables, x, method=encode)
    set_quant_mode('off')
    rel = float(jnp.linalg.norm(z_q - z_f) / jnp.linalg.norm(z_f))
    # measured 0.053 on this fixture (random weights compound per-layer
    # quant noise worse than trained ones); bound at ~2x margin
    assert rel < 0.10, f'encoder latent relative error {rel:.4f}'

    q = jnp.asarray(rng.normal(0, 0.5, (2, 16, 16, 16)), jnp.float32)
    y_f = model.apply(variables, q, method=decode)
    set_quant_mode('int8')
    y_q = model.apply(variables, q, method=decode)
    set_quant_mode('off')
    peak = float(np.abs(np.asarray(y_f)).max())
    mse = float(((np.asarray(y_q) - np.asarray(y_f)) ** 2).mean())
    psnr = 10.0 * np.log10(peak ** 2 / max(mse, 1e-12))
    assert psnr > 35.0, f'int8 generator PSNR vs float {psnr:.1f} dB'


def test_training_entrypoint_forces_quant_off(monkeypatch):
    """A stray CODEFORMER_QUANT=int8 in the env must never reach
    jax.grad: the quantize round has zero gradient. train_pipeline
    forces the mode off before any trace (train/train.py)."""
    set_quant_mode('int8')
    import codeformer_tpu.train.train as tt

    called = {}

    def fake_parse(root, args):
        called['yes'] = True
        raise SystemExit  # stop right after the mode resets

    monkeypatch.setattr(tt, 'parse_options', fake_parse)
    with pytest.raises(SystemExit):
        tt.train_pipeline('/tmp', args=[])
    assert called.get('yes')
    assert quant_mode() == 'off'
