"""Unit tests for core NN blocks: shapes, tap tables, VQ semantics."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from codeformer_tpu.models import CodeFormer, VQAutoEncoder
from codeformer_tpu.models.vqgan import (_build_encoder_blocks,
                                         _build_generator_blocks)
from codeformer_tpu.ops.vq import (_nearest_code_xla, codebook_lookup,
                                   nearest_code_indices)


def test_encoder_tap_table_matches_reference():
    """Tap indices must equal the reference's hardcoded table
    (codeformer_arch.py:204)."""
    _, taps = _build_encoder_blocks(64, 256, (1, 2, 2, 4, 4, 8), 2, 512,
                                    (16,), jnp.float32)
    assert taps == {'512': 2, '256': 5, '128': 8, '64': 11, '32': 14,
                    '16': 18}


def test_generator_tap_table_matches_reference():
    """Fuse indices must equal codeformer_arch.py:206."""
    _, taps = _build_generator_blocks(64, 256, (1, 2, 2, 4, 4, 8), 2, 512,
                                      (16,), 3, jnp.float32)
    assert taps == {'16': 6, '32': 9, '64': 12, '128': 15, '256': 18,
                    '512': 21}


def test_block_counts_match_reference():
    enc, _ = _build_encoder_blocks(64, 256, (1, 2, 2, 4, 4, 8), 2, 512,
                                   (16,), jnp.float32)
    gen, _ = _build_generator_blocks(64, 256, (1, 2, 2, 4, 4, 8), 2, 512,
                                     (16,), 3, jnp.float32)
    assert len(enc) == 25 and len(gen) == 25


def test_channels_table_matches_reference():
    m = CodeFormer()
    # trigger setup via init shape-eval on a dummy; channels computed in setup
    # reference: codeformer_arch.py:194-201
    expected = {'16': 512, '32': 256, '64': 256, '128': 128, '256': 128,
                '512': 64}
    nf, ch_mult, img = 64, (1, 2, 2, 4, 4, 8), 512
    got = {str(img // 2 ** s): nf * ch_mult[s] for s in range(len(ch_mult))}
    assert got == expected


def test_nearest_code_matches_bruteforce():
    rng = np.random.default_rng(0)
    z = jnp.asarray(rng.normal(size=(97, 16)), jnp.float32)
    cb = jnp.asarray(rng.normal(size=(33, 16)), jnp.float32)
    idx = nearest_code_indices(z, cb, use_pallas=False)
    d = jnp.sum((z[:, None, :] - cb[None, :, :]) ** 2, axis=-1)
    np.testing.assert_array_equal(np.asarray(idx), np.argmin(np.asarray(d), 1))


def test_codebook_lookup_matches_take():
    rng = np.random.default_rng(1)
    cb = jnp.asarray(rng.normal(size=(33, 16)), jnp.float32)
    idx = jnp.asarray(rng.integers(0, 33, size=(4, 7)))
    out = codebook_lookup(idx, cb)
    np.testing.assert_allclose(np.asarray(out),
                               np.asarray(jnp.take(cb, idx, axis=0)),
                               rtol=1e-6, atol=1e-6)


@pytest.mark.slow
def test_vq_straight_through_gradient():
    """d(loss)/d(z) through the quantizer must equal the identity path
    (straight-through estimator)."""
    v = VQAutoEncoder(img_size=64, nf=32, ch_mult=(1, 2), codebook_size=16,
                      emb_dim=8)
    x = jnp.ones((1, 64, 64, 3)) * 0.1
    params = v.init(jax.random.PRNGKey(0), x)

    def loss_fn(p):
        rec, closs, _ = v.apply(p, x)
        return jnp.mean(rec ** 2) + closs

    g = jax.grad(loss_fn)(params)
    # encoder must receive gradient (straight-through works end-to-end)
    enc_g = g['params']['encoder']['blocks_0']['kernel']
    assert float(jnp.max(jnp.abs(enc_g))) > 0.0


@pytest.mark.slow
def test_vqae_roundtrip_shapes():
    v = VQAutoEncoder(img_size=64, nf=32, ch_mult=(1, 2, 4), codebook_size=32,
                      emb_dim=16)
    x = jnp.zeros((2, 64, 64, 3))
    params = v.init(jax.random.PRNGKey(0), x)
    rec, closs, stats = v.apply(params, x)
    assert rec.shape == x.shape
    assert stats['min_encoding_indices'].shape == (2 * 16 * 16,)


def test_pallas_quantizer_interpret_matches_xla():
    """The Pallas argmin-L2 kernel (interpret mode on CPU) must select the
    same codes as the XLA path."""
    from codeformer_tpu.ops.vq import _nearest_code_pallas
    rng = np.random.default_rng(7)
    z = jnp.asarray(rng.normal(size=(300, 256)), jnp.float32)
    cb = jnp.asarray(rng.normal(size=(1024, 256)), jnp.float32)
    ref = nearest_code_indices(z, cb, use_pallas=False)
    out = _nearest_code_pallas(z, cb, interpret=True)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(ref))
