"""Column-packed conv kernels + stage-resident fused path (ops/colpack_conv).

Exactness is checked through the Pallas interpreter on CPU against the
plain XLA formulations; the same kernels run compiled on TPU when
`run_resblocks` (nn/blocks.py) engages over consecutive 512² ResBlocks.
Reference semantics: vqgan_arch.py:141-164 (ResBlock), :14-15 (GroupNorm
32, eps 1e-6).
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest
from flax import linen as nn

from codeformer_tpu.nn import blocks as blocks_mod
from codeformer_tpu.nn.blocks import ResBlock, run_resblocks, set_colpack_mode
from codeformer_tpu.ops import colpack_conv as cc


@pytest.fixture(scope='module')
def rng():
    return np.random.default_rng(7)


@pytest.fixture()
def interpret_mode():
    set_colpack_mode('interpret')
    yield
    set_colpack_mode('auto')


def test_conv3x3_colpack_exact(rng):
    b, h, w, ci, co = 2, 2 * cc.TY, 32, 8, 8
    x = jnp.asarray(rng.standard_normal((b, h, w, ci)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((3, 3, ci, co)), jnp.float32)
    bias = jnp.asarray(rng.standard_normal((co,)), jnp.float32)
    ref = cc.conv3x3_colpack_ref(x, k, bias)
    wc, wo = cc.pack_weights(k)
    got = cc.from_colpack(
        cc.conv3x3_colpack(cc.to_colpack(x), wc, wo,
                           jnp.concatenate([bias, bias]), interpret=True),
        co)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-4, atol=1e-4)


def test_colpack_is_free_reshape(rng):
    x = jnp.asarray(rng.standard_normal((1, 4, 6, 3)), jnp.float32)
    xc = cc.to_colpack(x)
    assert xc.shape == (1, 4, 3, 6)
    np.testing.assert_array_equal(np.asarray(xc[0, 1, 2, 3:6]),
                                  np.asarray(x[0, 1, 5]))
    np.testing.assert_array_equal(np.asarray(cc.from_colpack(xc, 3)),
                                  np.asarray(x))


def test_silu_affine_dots_matches_xla(rng):
    """silu_affine + conv3x3_dots == silu(gn(x)) -> conv (+ skip)."""
    b, h, w, c = 2, 2 * cc.TY, 32, 64
    x = jnp.asarray(rng.standard_normal((b, h, w, c)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((3, 3, c, c)) * 0.05, jnp.float32)
    bias = jnp.asarray(rng.standard_normal((c,)) * 0.1, jnp.float32)
    gamma = jnp.asarray(1 + 0.1 * rng.standard_normal((c,)), jnp.float32)
    beta = jnp.asarray(0.1 * rng.standard_normal((c,)), jnp.float32)

    gn = nn.GroupNorm(num_groups=32, epsilon=1e-6)
    hfeat = nn.silu(gn.apply({'params': {'scale': gamma, 'bias': beta}}, x))
    ref = cc.conv3x3_colpack_ref(hfeat, k, bias) + x

    xc = cc.to_colpack(x)
    a, bb = cc.gn_affine(cc.colpack_stats(xc), gamma, beta, h * w)
    wc, wo = cc.pack_weights(k)
    hf = cc.silu_affine(xc, a, bb)
    y, stats = cc.conv3x3_dots(
        hf, wc, wo, jnp.concatenate([bias, bias]),
        skip=xc, interpret=True)
    got = cc.from_colpack(y, c)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=2e-3, atol=2e-3)

    # emitted per-tile partials reproduce the global sums of the output
    folded = np.asarray(jnp.sum(stats, axis=1))[:, 0]
    s1 = folded.reshape(b, 2, c).sum(1)
    true = np.asarray(jnp.sum(got.astype(jnp.float32), axis=(1, 2)))
    np.testing.assert_allclose(s1, true, rtol=1e-4, atol=1e-3)


class _Runs(nn.Module):
    """Sequential ResBlocks with an optional fused colpack dispatch."""
    specs: tuple
    fused: bool = False

    def setup(self):
        self.blocks = [ResBlock(ci, co) for ci, co in self.specs]

    def __call__(self, x):
        if self.fused:
            y, j = run_resblocks(self.blocks, 0, x)
            assert j == len(self.blocks), (j, len(self.blocks))
            return y
        for blk in self.blocks:
            x = blk(x)
        return x


@pytest.mark.parametrize('specs', [((64, 64),),
                                   ((128, 64), (64, 64))])
def test_run_resblocks_interpret_parity(rng, interpret_mode, specs):
    b, h, w = 1, 2 * cc.TY, 32
    cin = specs[0][0]
    x = jnp.asarray(rng.standard_normal((b, h, w, cin)), jnp.float32)
    ref_m = _Runs(specs, fused=False)
    v = ref_m.init(jax.random.PRNGKey(0), x)
    ref = ref_m.apply(v, x)
    got = _Runs(specs, fused=True).apply(v, x)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=2e-3, atol=2e-3)


def test_run_resblocks_stops_at_taps(rng, interpret_mode):
    """A tap/fuse index inside a run must split it."""
    specs = ((64, 64), (64, 64))
    b, h, w = 1, 2 * cc.TY, 32
    x = jnp.asarray(rng.standard_normal((b, h, w, 64)), jnp.float32)

    class _Tapped(nn.Module):
        def setup(self):
            self.blocks = [ResBlock(ci, co) for ci, co in specs]

        def __call__(self, x):
            x, j = run_resblocks(self.blocks, 0, x, stop_after={0})
            for k in range(j, len(self.blocks)):
                x = self.blocks[k](x)
            return x, j

    m = _Tapped()
    v = m.init(jax.random.PRNGKey(0), x)
    y, j = m.apply(v, x)
    assert j == 1          # run ends after block 0 so the tap is observable
    ref = _Runs(specs, fused=False).apply(v, x)
    np.testing.assert_allclose(np.asarray(y), np.asarray(ref),
                               rtol=2e-3, atol=2e-3)


def test_run_resblocks_gate_off(rng):
    set_colpack_mode('off')
    try:
        m = _Runs(((64, 64),), fused=False)
        x = jnp.zeros((1, 2 * cc.TY, 32, 64), jnp.float32)
        v = m.init(jax.random.PRNGKey(0), x)

        class _Probe(nn.Module):
            def setup(self):
                self.blocks = [ResBlock(64, 64)]

            def __call__(self, x):
                _, j = run_resblocks(self.blocks, 0, x)
                return jnp.float32(j)

        p = _Probe()
        vv = p.init(jax.random.PRNGKey(0), x)
        assert int(p.apply(vv, x)) == 0
    finally:
        set_colpack_mode('auto')


def test_conv_in_packed_exact(rng):
    from jax import lax
    b, h, w = 2, 32, 32
    img = jnp.asarray(rng.standard_normal((b, h, w, 3)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((3, 3, 3, 64)) * 0.1, jnp.float32)
    bias = jnp.asarray(rng.standard_normal((64,)) * 0.1, jnp.float32)
    dn = lax.conv_dimension_numbers(img.shape, k.shape,
                                    ('NHWC', 'HWIO', 'NHWC'))
    ref = lax.conv_general_dilated(img, k, (1, 1), 'SAME',
                                   dimension_numbers=dn) + bias
    got = cc.from_colpack(cc.conv_in_packed(img, k, bias), 64)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-4, atol=1e-4)


def test_downsample_dots_exact(rng):
    from jax import lax
    b, h, w, c = 2, 4 * 2 * cc.TY, 64, 64
    x = jnp.asarray(rng.standard_normal((b, h, w, c)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((3, 3, c, c)) * 0.05, jnp.float32)
    bias = jnp.asarray(rng.standard_normal((c,)) * 0.1, jnp.float32)
    xp = jnp.pad(x, ((0, 0), (0, 1), (0, 1), (0, 0)))
    dn = lax.conv_dimension_numbers(xp.shape, k.shape,
                                    ('NHWC', 'HWIO', 'NHWC'))
    ref = lax.conv_general_dilated(xp, k, (2, 2), 'VALID',
                                   dimension_numbers=dn) + bias
    got = cc.from_colpack(
        cc.downsample_dots(cc.to_colpack(x), k, bias, interpret=True), c)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-4, atol=1e-4)


def test_encoder_stage_interpret_parity(rng, interpret_mode):
    """conv_in -> RB -> RB -> Downsample: full enclave vs normal blocks."""
    from codeformer_tpu.nn.blocks import (Downsample, FastConv3x3,
                                          run_edge_block)

    class Stage(nn.Module):
        fused: bool = False

        def setup(self):
            self.blocks = [FastConv3x3(64), ResBlock(64, 64),
                           ResBlock(64, 64), Downsample(64)]

        def __call__(self, x):
            if not self.fused:
                for blk in self.blocks:
                    x = blk(x)
                return x
            x, handled = run_edge_block(self.blocks[0], x)
            assert handled
            x, j = run_resblocks(self.blocks, 1, x)
            assert j == 3
            x, handled = run_edge_block(self.blocks[3], x)
            assert handled
            return x

    b, h, w = 1, 4 * cc.TY, 32
    img = jnp.asarray(rng.standard_normal((b, h, w, 3)), jnp.float32)
    ref_m = Stage(fused=False)
    v = ref_m.init(jax.random.PRNGKey(0), img)
    ref = ref_m.apply(v, img)
    got = Stage(fused=True).apply(v, img)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=2e-3, atol=2e-3)


@pytest.mark.slow
def test_encoder_taps_survive_fusion(rng, interpret_mode):
    """Full-Encoder interpret-mode parity with fusion enabled, covering
    the tap-as-last-block-of-a-run case: a fused run may legally END on a
    tapped ResBlock (stop_after only stops it crossing one), and the
    Encoder must still record that feature (round-2 ADVICE medium)."""
    from codeformer_tpu.models.vqgan import Encoder

    enc = Encoder(resolution=64, ch_mult=(1, 2), num_res_blocks=2,
                  attn_resolutions=())
    x = jnp.asarray(rng.standard_normal((1, 64, 64, 3)), jnp.float32)
    v = enc.init(jax.random.PRNGKey(0), x)
    taps = tuple(enc.apply(v, method=lambda m: m.tap_by_size).values())
    assert taps, 'encoder built no taps'

    set_colpack_mode('off')
    ref_out, ref_feats = enc.apply(v, x, tap_indices=taps)
    set_colpack_mode('interpret')
    got_out, got_feats = enc.apply(v, x, tap_indices=taps)

    assert set(got_feats) == set(ref_feats), \
        f'fusion dropped taps: {set(ref_feats) - set(got_feats)}'
    np.testing.assert_allclose(np.asarray(got_out), np.asarray(ref_out),
                               rtol=5e-3, atol=5e-3)
    for k in ref_feats:
        np.testing.assert_allclose(np.asarray(got_feats[k]),
                                   np.asarray(ref_feats[k]),
                                   rtol=5e-3, atol=5e-3)


def test_colpack_ok_rejects_single_tile():
    """h == TY would trip conv3x3_dots' n_tiles >= 2 assert; the gate
    must send it to XLA instead (round-2 ADVICE low)."""
    from codeformer_tpu.nn.blocks import _colpack_ok
    set_colpack_mode('interpret')
    try:
        blk = ResBlock(64, 64)
        ok_small = _colpack_ok(
            blk.bind({'params': ResBlock(64, 64).init(
                jax.random.PRNGKey(0),
                jnp.zeros((1, 2 * cc.TY, 16, 64)))['params']}),
            jnp.zeros((1, cc.TY, 16, 64)))
        assert not ok_small
    finally:
        set_colpack_mode('auto')


def test_env_colpack_mode_validates(monkeypatch):
    from codeformer_tpu.nn.blocks import _env_colpack_mode
    monkeypatch.setenv('CODEFORMER_COLPACK', 'on')
    with pytest.warns(UserWarning, match='CODEFORMER_COLPACK'):
        assert _env_colpack_mode() == 'off'
    monkeypatch.setenv('CODEFORMER_COLPACK', 'auto')
    assert _env_colpack_mode() == 'auto'


def test_upsample_colpack_exact(rng, interpret_mode):
    """_upsample_colpack == Upsample module output, reshaped."""
    from codeformer_tpu.nn.blocks import Upsample, _upsample_colpack
    b, h, w, c = 1, cc.TY, 16, 64
    x = jnp.asarray(rng.standard_normal((b, h, w, c)), jnp.float32)
    m = Upsample(c)
    v = m.init(jax.random.PRNGKey(0), x)
    ref = m.apply(v, x)

    class _Probe(nn.Module):
        def setup(self):
            self.up = Upsample(c)

        def __call__(self, x):
            return _upsample_colpack(self.up, x)

    got = cc.from_colpack(
        _Probe().apply({'params': {'up': v['params']}}, x), c)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-4, atol=1e-4)


def test_decoder_tail_interpret_parity(rng, interpret_mode):
    """[Upsample, RB, RB, GN, conv_out] enclave vs the sequential blocks."""
    from codeformer_tpu.nn.blocks import (FastConv3x3, GroupNorm32,
                                          Upsample, run_decoder_tail)

    class Tail(nn.Module):
        fused: bool = False

        def setup(self):
            self.blocks = [Upsample(128), ResBlock(128, 64),
                           ResBlock(64, 64), GroupNorm32(),
                           FastConv3x3(3)]

        def __call__(self, x):
            if self.fused:
                y, handled = run_decoder_tail(self.blocks, 0, x)
                assert handled
                return y
            for blk in self.blocks:     # reference: NO swish before
                x = blk(x)              # conv_out (vqgan_arch.py:313-314)
            return x

    b, h, w = 1, cc.TY, 16
    x = jnp.asarray(0.5 * rng.standard_normal((b, h, w, 128)), jnp.float32)
    ref_m = Tail(fused=False)
    v = ref_m.init(jax.random.PRNGKey(0), x)
    ref = ref_m.apply(v, x)
    got = Tail(fused=True).apply(v, x)
    assert got.shape == (b, 2 * h, 2 * w, 3)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=2e-3, atol=2e-3)


def test_conv3x3_imgpair_exact(rng):
    """Image-pair weight-stationary kernel (ops/imgpair_conv): exact
    3x3 SAME conv through the Pallas interpreter, even and odd batch
    (VERDICT r4 item 4's named design — see roofline round-5 serving
    section for the on-chip verdict)."""
    from jax import lax

    from codeformer_tpu.ops.imgpair_conv import TX, TY, conv3x3_pair

    h, w, c = 2 * TY, TX, 16
    k = jnp.asarray(rng.standard_normal((3, 3, c, c)) * 0.1, jnp.float32)
    bias = jnp.asarray(rng.standard_normal((c,)), jnp.float32)
    for b in (4, 3):
        x = jnp.asarray(rng.standard_normal((b, h, w, c)), jnp.float32)
        dn = lax.conv_dimension_numbers(x.shape, k.shape,
                                        ('NHWC', 'HWIO', 'NHWC'))
        ref = lax.conv_general_dilated(x, k, (1, 1), 'SAME',
                                       dimension_numbers=dn) + bias
        got = conv3x3_pair(x, k, bias, interpret=True)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   rtol=1e-4, atol=1e-4)
