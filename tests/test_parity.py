"""Numerical parity tests vs the reference PyTorch implementation.

Strategy (SURVEY.md §4): instantiate the reference torch modules with random
weights, convert the state dict through our checkpoint converter, and compare
forward activations. This validates both the converter and the JAX modules in
one shot — a silent transpose or a wrong tap index fails loudly here.
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

torch = pytest.importorskip('torch')

from codeformer_tpu.models import CodeFormer, VQAutoEncoder, VQGANDiscriminator
from codeformer_tpu.nn.transformer import TransformerSALayer
from codeformer_tpu.nn.blocks import FuseSftBlock
from codeformer_tpu.utils.convert import torch_state_dict_to_flax

from torch_ref import load_reference_archs

vq_ref, cf_ref = load_reference_archs()


def _nchw(x_nhwc: np.ndarray) -> torch.Tensor:
    return torch.from_numpy(np.transpose(x_nhwc, (0, 3, 1, 2)).copy())


def _nhwc(t: torch.Tensor) -> np.ndarray:
    return np.transpose(t.detach().numpy(), (0, 2, 3, 1))


@pytest.fixture(scope='module')
def rng():
    return np.random.default_rng(42)


def test_transformer_layer_parity(rng):
    tlayer = cf_ref.TransformerSALayer(embed_dim=32, nhead=4, dim_mlp=64,
                                       dropout=0.0).eval()
    x = rng.normal(size=(2, 10, 32)).astype(np.float32)  # (B, S, C)
    pos = rng.normal(size=(10, 32)).astype(np.float32)
    with torch.no_grad():
        # torch layer is seq-major (S, B, C)
        xt = torch.from_numpy(np.transpose(x, (1, 0, 2)).copy())
        post = torch.from_numpy(pos)[:, None, :].repeat(1, 2, 1)
        ref = tlayer(xt, query_pos=post).numpy().transpose(1, 0, 2)

    mine = TransformerSALayer(embed_dim=32, nhead=4, dim_mlp=64)
    variables = torch_state_dict_to_flax(tlayer.state_dict())
    out = mine.apply(variables, jnp.asarray(x), query_pos=jnp.asarray(pos)[None])
    np.testing.assert_allclose(np.asarray(out), ref, rtol=1e-4, atol=1e-5)


def test_fuse_sft_parity(rng):
    fuse = cf_ref.Fuse_sft_block(32, 32).eval()
    enc = rng.normal(size=(2, 8, 8, 32)).astype(np.float32)
    dec = rng.normal(size=(2, 8, 8, 32)).astype(np.float32)
    with torch.no_grad():
        ref = _nhwc(fuse(_nchw(enc), _nchw(dec), w=0.7))
    mine = FuseSftBlock(32, 32)
    variables = torch_state_dict_to_flax(fuse.state_dict())
    out = mine.apply(variables, jnp.asarray(enc), jnp.asarray(dec), 0.7)
    np.testing.assert_allclose(np.asarray(out), ref, rtol=1e-4, atol=1e-5)


def test_vqae_parity_tiny(rng):
    t = vq_ref.VQAutoEncoder(64, 32, [1, 2, 4], 'nearest', 2, [16],
                             codebook_size=32, emb_dim=16).eval()
    x = (rng.normal(size=(2, 64, 64, 3)) * 0.3).astype(np.float32)
    with torch.no_grad():
        ref_out, ref_loss, ref_stats = t(_nchw(x))

    m = VQAutoEncoder(img_size=64, nf=32, ch_mult=(1, 2, 4), codebook_size=32,
                      emb_dim=16)
    variables = torch_state_dict_to_flax(t.state_dict())
    out, loss, stats = m.apply(variables, jnp.asarray(x))

    ref_idx = ref_stats['min_encoding_indices'].numpy().reshape(-1)
    np.testing.assert_array_equal(np.asarray(stats['min_encoding_indices']),
                                  ref_idx)
    np.testing.assert_allclose(np.asarray(out), _nhwc(ref_out),
                               rtol=1e-3, atol=1e-4)
    np.testing.assert_allclose(float(loss), float(ref_loss), rtol=1e-4,
                               atol=1e-6)


def test_discriminator_parity(rng):
    t = vq_ref.VQGANDiscriminator(nc=3, ndf=32, n_layers=3).eval()
    x = rng.normal(size=(2, 64, 64, 3)).astype(np.float32)
    with torch.no_grad():
        ref = _nhwc(t(_nchw(x)))
    m = VQGANDiscriminator(nc=3, ndf=32, n_layers=3)
    variables = torch_state_dict_to_flax(t.state_dict())
    out = m.apply(variables, x, train=False)
    np.testing.assert_allclose(np.asarray(out), ref, rtol=1e-4, atol=1e-4)


@pytest.mark.slow
def test_codeformer_parity_full(rng):
    """Full 512x512 CodeFormer parity — the reference ctor is fixed-size, so
    this is the one full-scale run. Validates taps, transformer, codebook
    selection, AdaIN and SFT fusion end to end."""
    t = cf_ref.CodeFormer(dim_embd=64, n_head=4, n_layers=2,
                          codebook_size=64, latent_size=256,
                          connect_list=['32', '64', '128', '256'],
                          fix_modules=None).eval()
    # re-randomize position_emb (zeros-init would mask pos-emb bugs)
    with torch.no_grad():
        t.position_emb.normal_(0, 0.02)
    x = (rng.normal(size=(1, 512, 512, 3)) * 0.2).astype(np.float32)
    with torch.no_grad():
        ref_out, ref_logits, ref_lq = t(_nchw(x), w=0.6, adain=True)

    m = CodeFormer(dim_embd=64, n_head=4, n_layers=2, codebook_size=64,
                   latent_size=256, connect_list=('32', '64', '128', '256'))
    variables = torch_state_dict_to_flax(t.state_dict())
    out, logits, lq = m.apply(variables, jnp.asarray(x), 0.6, adain=True)

    np.testing.assert_allclose(np.asarray(lq), _nhwc(ref_lq),
                               rtol=1e-3, atol=1e-4)
    np.testing.assert_allclose(np.asarray(logits), ref_logits.numpy(),
                               rtol=1e-3, atol=2e-4)
    ref_idx = ref_logits.argmax(-1).numpy()
    idx = np.asarray(jnp.argmax(logits, -1))
    match = (idx == ref_idx).mean()
    assert match >= 0.995, f'code selection match {match}'
    if match == 1.0:
        np.testing.assert_allclose(np.asarray(out), _nhwc(ref_out),
                                   rtol=1e-2, atol=1e-3)


@pytest.mark.slow
def test_codeformer_parity_production_config_w06_tight(rng):
    """Torch parity at the SHIPPED restoration topology — dim_embd 512,
    8 heads, 9 layers, codebook 1024 (inference_codeformer.py:135-136) —
    at full 512x512, w=0.6, tight logits tolerance (atol 5e-4).
    test_codeformer_parity_full covers the same spatial extent at a
    reduced embedding width; this run closes the remaining gap where a
    head-dim-dependent bug (attention scaling, in_proj split, fc widths)
    could hide. Sibling _w05_tiered runs w=0.5 with tiered tolerances."""
    t = cf_ref.CodeFormer(dim_embd=512, n_head=8, n_layers=9,
                          codebook_size=1024, latent_size=256,
                          connect_list=['32', '64', '128', '256'],
                          fix_modules=None).eval()
    with torch.no_grad():
        t.position_emb.normal_(0, 0.02)
    x = (rng.normal(size=(1, 512, 512, 3)) * 0.2).astype(np.float32)
    with torch.no_grad():
        ref_out, ref_logits, ref_lq = t(_nchw(x), w=0.6, adain=True)

    m = CodeFormer(dim_embd=512, n_head=8, n_layers=9,
                   codebook_size=1024, latent_size=256,
                   connect_list=('32', '64', '128', '256'))
    variables = torch_state_dict_to_flax(t.state_dict())
    out, logits, lq = m.apply(variables, jnp.asarray(x), 0.6, adain=True)

    np.testing.assert_allclose(np.asarray(lq), _nhwc(ref_lq),
                               rtol=1e-3, atol=1e-4)
    np.testing.assert_allclose(np.asarray(logits), ref_logits.numpy(),
                               rtol=1e-3, atol=5e-4)
    ref_idx = ref_logits.argmax(-1).numpy()
    idx = np.asarray(jnp.argmax(logits, -1))
    match = (idx == ref_idx).mean()
    assert match >= 0.995, f'code selection match {match}'
    if match == 1.0:
        np.testing.assert_allclose(np.asarray(out), _nhwc(ref_out),
                                   rtol=1e-2, atol=1e-3)


def test_converter_tree_structure_matches_init():
    """The converted torch state dict must produce exactly the parameter
    tree flax initializes — catches silent key drift in either direction."""
    import jax
    t = cf_ref.CodeFormer(dim_embd=64, n_head=4, n_layers=2,
                          codebook_size=64, latent_size=256,
                          connect_list=['32', '64', '128', '256'],
                          fix_modules=None)
    converted = torch_state_dict_to_flax(t.state_dict())['params']
    m = CodeFormer(dim_embd=64, n_head=4, n_layers=2, codebook_size=64,
                   latent_size=256,
                   connect_list=('32', '64', '128', '256'))
    init_shapes = jax.eval_shape(
        lambda: m.init(jax.random.PRNGKey(0),
                       jnp.zeros((1, 512, 512, 3)), 0.5))['params']

    conv_paths = {tuple(str(getattr(p, 'key', p)) for p in path):
                  leaf.shape for path, leaf in
                  jax.tree_util.tree_flatten_with_path(converted)[0]}
    init_paths = {tuple(str(getattr(p, 'key', p)) for p in path):
                  leaf.shape for path, leaf in
                  jax.tree_util.tree_flatten_with_path(init_shapes)[0]}
    missing = set(init_paths) - set(conv_paths)
    extra = set(conv_paths) - set(init_paths)
    assert not missing, f'converter missing params: {sorted(missing)[:5]}'
    assert not extra, f'converter produced extras: {sorted(extra)[:5]}'
    mismatched = [k for k in init_paths
                  if conv_paths[k] != init_paths[k]]
    assert not mismatched, mismatched[:5]


def test_position_embedding_sine_parity(rng):
    """position_embedding_sine vs reference PositionEmbeddingSine
    (codeformer_arch.py:46-86; defined-but-unused there, provided for
    completeness). NHWC here vs NCHW there."""
    from codeformer_tpu.models.codeformer import position_embedding_sine

    x = torch.zeros(2, 8, 6, 10)  # (B, C, H, W) — only shape is used
    mask_np = (rng.uniform(size=(2, 6, 10)) < 0.3)
    for normalize, scale, mask in ((False, None, None),
                                   (True, None, None),
                                   (True, 6.28, None),
                                   (True, None, mask_np)):
        t = cf_ref.PositionEmbeddingSine(num_pos_feats=16,
                                         normalize=normalize, scale=scale)
        with torch.no_grad():
            ref = t(x, None if mask is None else torch.from_numpy(mask))
        got = position_embedding_sine(
            (2, 6, 10), num_pos_feats=16, normalize=normalize,
            scale=scale,
            mask=None if mask is None else jnp.asarray(mask))
        np.testing.assert_allclose(np.asarray(got), _nhwc(ref),
                                   rtol=1e-5, atol=1e-5)


@pytest.mark.slow
def test_codeformer_parity_production_config_w05_tiered(rng):
    """Torch parity at the PRODUCTION transformer width: dim_embd 512,
    9 layers, 8 heads, codebook 1024 (inference_codeformer.py:135-136),
    w=0.5 with tiered logits tolerance (9 pre-LN layers at width 512
    accumulate more float drift; see inline comment). Sibling
    _w06_tight is the w=0.6 tight-tolerance variant of the same
    topology. One full-scale run closes the head-dim-dependent gap
    (attention scaling, in_proj split, per-head pos-emb broadcast) that
    the reduced-width test_codeformer_parity_full can't see."""
    t = cf_ref.CodeFormer(dim_embd=512, n_head=8, n_layers=9,
                          codebook_size=1024, latent_size=256,
                          connect_list=['32', '64', '128', '256'],
                          fix_modules=None).eval()
    with torch.no_grad():
        t.position_emb.normal_(0, 0.02)
    x = (rng.normal(size=(1, 512, 512, 3)) * 0.2).astype(np.float32)
    with torch.no_grad():
        ref_out, ref_logits, ref_lq = t(_nchw(x), w=0.5, adain=True)

    m = CodeFormer(dim_embd=512, n_head=8, n_layers=9,
                   codebook_size=1024, latent_size=256,
                   connect_list=('32', '64', '128', '256'))
    variables = torch_state_dict_to_flax(t.state_dict())
    out, logits, lq = m.apply(variables, jnp.asarray(x), 0.5, adain=True)

    np.testing.assert_allclose(np.asarray(lq), _nhwc(ref_lq),
                               rtol=1e-3, atol=1e-4)
    # 9 pre-LN layers at width 512 accumulate more float drift than the
    # tiny config; logits tolerance is tiered accordingly
    np.testing.assert_allclose(np.asarray(logits), ref_logits.numpy(),
                               rtol=2e-3, atol=2e-3)
    ref_idx = ref_logits.argmax(-1).numpy()
    idx = np.asarray(jnp.argmax(logits, -1))
    match = (idx == ref_idx).mean()
    assert match >= 0.995, f'code selection match {match}'
    if match == 1.0:
        np.testing.assert_allclose(np.asarray(out), _nhwc(ref_out),
                                   rtol=1e-2, atol=1e-3)
