"""Pipeline integration tests: aligned CLI end-to-end (tiny run on CPU),
batched video detection, restorer fallback guard."""
import os

import cv2
import numpy as np
import pytest


@pytest.mark.slow
def test_batched_detect_faces_matches_single():
    from codeformer_tpu.pipeline.detector import FaceDetector
    det = FaceDetector('retinaface_mobile0.25', allow_random=True,
                       max_faces=8, pre_nms_topk=128)
    rng = np.random.default_rng(0)
    frames = rng.uniform(0, 255, (3, 96, 128, 3)).astype(np.uint8)
    batched = det.batched_detect_faces(frames, conf_threshold=0.05)
    assert len(batched) == 3
    for i, frame in enumerate(frames):
        single = det.detect_faces(frame, conf_threshold=0.05)
        np.testing.assert_allclose(batched[i], single, rtol=1e-3,
                                   atol=1e-2)


def test_restorer_passthrough_on_failure(monkeypatch):
    """The runtime guard must return inputs unchanged when the graph
    fails (reference inference_codeformer.py:203-211)."""
    from codeformer_tpu.pipeline.restorer import CodeFormerRestorer
    r = CodeFormerRestorer.__new__(CodeFormerRestorer)
    r.batch_buckets = [4]
    r.face_size = 16

    def boom(*a, **k):
        raise RuntimeError('synthetic failure')

    r._restore_chunk = boom
    faces = [np.full((16, 16, 3), i, np.uint8) for i in range(3)]
    out = r.restore_batch(faces, w=0.5)
    assert len(out) == 3
    for a, b in zip(out, faces):
        np.testing.assert_array_equal(a, b)


@pytest.mark.slow
def test_aligned_cli_end_to_end(tmp_path):
    """Drive the real CLI main() on two fixture faces with random weights
    (the full 512 graph on CPU — the slowest test in the suite)."""
    from codeformer_tpu.cli.inference_codeformer import main
    src = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), 'inputs', 'cropped_faces')
    in_dir = tmp_path / 'in'
    in_dir.mkdir()
    names = sorted(os.listdir(src))[:2]
    for n in names:
        img = cv2.imread(os.path.join(src, n))
        cv2.imwrite(str(in_dir / n), img)
    out_dir = tmp_path / 'out'
    main(['-i', str(in_dir), '--has_aligned', '-w', '0.5',
          '--random-init', '-o', str(out_dir), '--batch', '2'])
    outs = sorted(os.listdir(out_dir / 'restored_faces'))
    assert outs == [n.replace('.jpg', '.png') for n in names]
    for n in outs:
        img = cv2.imread(str(out_dir / 'restored_faces' / n))
        assert img.shape == (512, 512, 3)


def test_restorer_multichip_serving():
    """Data-parallel serving: 8-device mesh, batch sharded on 'data',
    outputs match the single-device path."""
    import jax
    import jax.numpy as jnp
    from codeformer_tpu.parallel import create_mesh
    from codeformer_tpu.pipeline.restorer import CodeFormerRestorer

    kwargs = dict(dim_embd=32, codebook_size=32, n_head=4, n_layers=2,
                  connect_list=('32', '64'), dtype=jnp.float32,
                  face_size=64, rng_seed=0)
    # tiny backbone for the test
    from codeformer_tpu.models import CodeFormer
    import codeformer_tpu.pipeline.restorer as restorer_mod

    class TinyRestorer(CodeFormerRestorer):
        pass

    # monkeypatch the model construction for a tiny 64px backbone
    orig = restorer_mod.CodeFormer

    def tiny(**kw):
        kw.update(img_size=64, nf=32, ch_mult=(1, 2, 4), emb_dim=16,
                  latent_size=256)
        return orig(**kw)

    restorer_mod.CodeFormer = tiny
    try:
        mesh = create_mesh(8, model_parallel=1)
        r_mesh = TinyRestorer(mesh=mesh, batch_buckets=(8,), **kwargs)
        r_single = TinyRestorer(batch_buckets=(8,), **kwargs)
    finally:
        restorer_mod.CodeFormer = orig

    rng = np.random.default_rng(0)
    faces = [rng.integers(0, 255, (64, 64, 3), dtype=np.uint8)
             for _ in range(5)]
    out_mesh = r_mesh.restore_batch(faces, w=0.5)
    out_single = r_single.restore_batch(faces, w=0.5)
    assert len(out_mesh) == 5
    for a, b in zip(out_mesh, out_single):
        np.testing.assert_allclose(a.astype(int), b.astype(int), atol=1)
