"""Multi-device tests on the 8-virtual-CPU mesh: shardings compile and the
joint GAN train step executes with dp+tp (SURVEY.md §4 test plan, item 4)."""
import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from codeformer_tpu.parallel import create_mesh, local_batch_slice


def test_mesh_shapes():
    mesh = create_mesh(8, model_parallel=2)
    assert dict(mesh.shape) == {'data': 4, 'model': 2}
    assert local_batch_slice(16, mesh) == 4


def test_mesh_indivisible_raises():
    with pytest.raises(ValueError):
        create_mesh(8, model_parallel=3)
    mesh = create_mesh(8, model_parallel=2)
    with pytest.raises(ValueError):
        local_batch_slice(6, mesh)


@pytest.mark.slow  # ~3min cold compile on 1 CPU core (cached afterwards)
def test_dryrun_multichip_8dev():
    import sys
    sys.path.insert(0, '/root/repo')
    import __graft_entry__ as g
    g.dryrun_multichip(8)


@pytest.mark.slow
def test_train_step_dp_matches_single_device():
    """One data-parallel train step must produce the same params as the
    single-device step on the same global batch (the DP-correctness
    invariant the reference gets from DDP grad averaging)."""
    import functools
    from jax.sharding import NamedSharding, PartitionSpec as P
    from codeformer_tpu.models import CodeFormer, VQGANDiscriminator
    from codeformer_tpu.train.gan_step import (init_gan_train_state,
                                               make_codeformer_train_step)

    model = CodeFormer(img_size=64, nf=32, ch_mult=(1, 2, 4),
                       codebook_size=64, emb_dim=16, dim_embd=64, n_head=4,
                       n_layers=2, latent_size=256, connect_list=('32',))
    disc = VQGANDiscriminator(ndf=32, n_layers=2)
    # SGD, not Adam: Adam's normalized update amplifies reduction-order fp
    # noise on near-zero grads to ~lr scale; SGD makes the test check the
    # actual invariant (cross-shard gradient averaging == global mean).
    opt_g = optax.sgd(1e-2)
    opt_d = optax.sgd(1e-2)

    rng = np.random.default_rng(0)
    batch = {
        'in': jnp.asarray(rng.normal(size=(4, 64, 64, 3)), jnp.float32),
        'gt': jnp.asarray(rng.normal(size=(4, 64, 64, 3)), jnp.float32),
        'latent_gt': jnp.asarray(rng.integers(0, 64, (4, 256)), jnp.int32),
        'quant_gt': jnp.asarray(rng.normal(size=(4, 16, 16, 16)),
                                jnp.float32),
    }
    init_fn = functools.partial(init_gan_train_state, model, disc, opt_g,
                                opt_d)
    step = make_codeformer_train_step(model, disc, opt_g, opt_d)

    # single device
    state1 = init_fn(jax.random.PRNGKey(0), batch)
    new1, m1 = jax.jit(step)(state1, batch)

    # 4-way data parallel
    mesh = create_mesh(4, model_parallel=1)
    bshard = jax.tree.map(
        lambda x: NamedSharding(mesh, P('data', *([None] * (x.ndim - 1)))),
        batch)
    state4 = init_fn(jax.random.PRNGKey(0), batch)
    new4, m4 = jax.jit(step)(state4, jax.device_put(batch, bshard))

    np.testing.assert_allclose(float(m1['l_g_total']),
                               float(m4['l_g_total']), rtol=1e-5)
    l1 = jax.tree.leaves(new1.params_g)
    l4 = jax.tree.leaves(new4.params_g)
    for a, b in zip(l1, l4):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-5)

    # accum_steps=2 on the same mesh: the scanned microbatch grads
    # average to the exact full-batch gradient, so the SGD params match
    # the monolithic step too (dp x accumulation composition)
    step_acc = make_codeformer_train_step(model, disc, opt_g, opt_d,
                                          accum_steps=2)
    state_a = init_fn(jax.random.PRNGKey(0), batch)
    new_a, m_a = jax.jit(step_acc)(state_a, jax.device_put(batch, bshard))
    np.testing.assert_allclose(float(m_a['l_g_total']),
                               float(m1['l_g_total']), rtol=1e-5)
    for a, b in zip(l1, jax.tree.leaves(new_a.params_g)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-5)
