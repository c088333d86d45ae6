"""YOLOv5-face parity vs the reference torch Model (both variants)."""
import numpy as np
import pytest

import jax.numpy as jnp

torch = pytest.importorskip('torch')

from codeformer_tpu.models.yolov5face import YoloFace
from codeformer_tpu.utils.convert import torch_state_dict_to_flax

from torch_ref import REF, load_facelib_detection


def _load_ref_model(variant):
    import sys
    load_facelib_detection()  # sets up basicsr/torchvision stubs + sys.path
    from facelib.detection.yolov5face.models.yolo import Model
    cfg = (f'{REF}/facelib/detection/yolov5face/models/{variant}.yaml')
    return Model(cfg=cfg).eval()


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


@pytest.mark.parametrize('variant', ['yolov5n', 'yolov5l'])
def test_yolov5face_parity(variant):
    t = _load_ref_model(variant)
    _randomize(t, 0)
    x = np.random.default_rng(1).uniform(0, 1, (1, 128, 128, 3)).astype(
        np.float32)
    with torch.no_grad():
        ref_pred = t(torch.from_numpy(
            x.transpose(0, 3, 1, 2).copy()))[0].numpy()

    m = YoloFace(variant=variant)
    variables = torch_state_dict_to_flax(t.state_dict())
    pred = np.asarray(m.apply(variables, jnp.asarray(x)))
    assert pred.shape == ref_pred.shape, (pred.shape, ref_pred.shape)
    np.testing.assert_allclose(pred, ref_pred, rtol=2e-3, atol=2e-3)
