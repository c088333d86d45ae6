"""Load the reference PyTorch model definitions standalone for parity tests.

The reference package (basicsr) has a heavy import chain (torchvision, lpips,
...) that isn't available here, so we materialize only the two arch modules
we need, backed by a minimal fake `basicsr` package. The reference tree is
read-only and never modified.
"""
import importlib.util
import logging
import sys
import types

REF = '/root/reference'


def _fake_basicsr():
    if 'basicsr' in sys.modules:
        return
    basicsr = types.ModuleType('basicsr')
    utils = types.ModuleType('basicsr.utils')
    utils.get_root_logger = lambda *a, **k: logging.getLogger('ref')
    registry_mod = types.ModuleType('basicsr.utils.registry')

    class _Reg:
        def register(self, *a, **k):
            def deco(x):
                return x
            return deco

        def get(self, name):
            raise KeyError(name)

    registry_mod.ARCH_REGISTRY = _Reg()
    utils.registry = registry_mod
    archs = types.ModuleType('basicsr.archs')
    sys.modules['basicsr'] = basicsr
    sys.modules['basicsr.utils'] = utils
    sys.modules['basicsr.utils.registry'] = registry_mod
    sys.modules['basicsr.archs'] = archs
    basicsr.utils = utils
    basicsr.archs = archs


def _load(name: str, path: str):
    if name in sys.modules:
        return sys.modules[name]
    spec = importlib.util.spec_from_file_location(name, path)
    mod = importlib.util.module_from_spec(spec)
    sys.modules[name] = mod
    spec.loader.exec_module(mod)
    return mod


def _fake_torchvision():
    """Minimal torchvision stand-in: ops.nms (pure torch greedy NMS),
    models.resnet50 (standard bottleneck ResNet), models._utils.
    IntermediateLayerGetter — just enough to run the reference detector."""
    if 'torchvision' in sys.modules:
        return
    import torch
    import torch.nn as nn

    tv = types.ModuleType('torchvision')
    ops = types.ModuleType('torchvision.ops')
    models = types.ModuleType('torchvision.models')
    mutils = types.ModuleType('torchvision.models._utils')
    tvutils = types.ModuleType('torchvision.utils')

    def nms(boxes, scores, iou_threshold):
        thr = iou_threshold
        order = scores.argsort(descending=True)
        keep = []
        while order.numel() > 0:
            i = order[0].item()
            keep.append(i)
            if order.numel() == 1:
                break
            rest = order[1:]
            xx1 = torch.maximum(boxes[i, 0], boxes[rest, 0])
            yy1 = torch.maximum(boxes[i, 1], boxes[rest, 1])
            xx2 = torch.minimum(boxes[i, 2], boxes[rest, 2])
            yy2 = torch.minimum(boxes[i, 3], boxes[rest, 3])
            inter = (xx2 - xx1).clamp(min=0) * (yy2 - yy1).clamp(min=0)
            area_i = ((boxes[i, 2] - boxes[i, 0])
                      * (boxes[i, 3] - boxes[i, 1]))
            areas = ((boxes[rest, 2] - boxes[rest, 0])
                     * (boxes[rest, 3] - boxes[rest, 1]))
            iou = inter / (area_i + areas - inter)
            order = rest[iou <= thr]
        return torch.as_tensor(keep, dtype=torch.long)

    ops.nms = nms

    class _Bottleneck(nn.Module):
        expansion = 4

        def __init__(self, inplanes, planes, stride=1, downsample=None):
            super().__init__()
            self.conv1 = nn.Conv2d(inplanes, planes, 1, bias=False)
            self.bn1 = nn.BatchNorm2d(planes)
            self.conv2 = nn.Conv2d(planes, planes, 3, stride, 1, bias=False)
            self.bn2 = nn.BatchNorm2d(planes)
            self.conv3 = nn.Conv2d(planes, planes * 4, 1, bias=False)
            self.bn3 = nn.BatchNorm2d(planes * 4)
            self.relu = nn.ReLU(inplace=True)
            self.downsample = downsample
            self.stride = stride

        def forward(self, x):
            identity = x
            out = self.relu(self.bn1(self.conv1(x)))
            out = self.relu(self.bn2(self.conv2(out)))
            out = self.bn3(self.conv3(out))
            if self.downsample is not None:
                identity = self.downsample(x)
            return self.relu(out + identity)

    class _ResNet(nn.Module):
        def __init__(self, layers=(3, 4, 6, 3)):
            super().__init__()
            self.inplanes = 64
            self.conv1 = nn.Conv2d(3, 64, 7, 2, 3, bias=False)
            self.bn1 = nn.BatchNorm2d(64)
            self.relu = nn.ReLU(inplace=True)
            self.maxpool = nn.MaxPool2d(3, 2, 1)
            self.layer1 = self._make_layer(64, layers[0])
            self.layer2 = self._make_layer(128, layers[1], 2)
            self.layer3 = self._make_layer(256, layers[2], 2)
            self.layer4 = self._make_layer(512, layers[3], 2)
            self.avgpool = nn.AdaptiveAvgPool2d(1)
            self.fc = nn.Linear(2048, 1000)

        def _make_layer(self, planes, blocks, stride=1):
            downsample = None
            if stride != 1 or self.inplanes != planes * 4:
                downsample = nn.Sequential(
                    nn.Conv2d(self.inplanes, planes * 4, 1, stride,
                              bias=False),
                    nn.BatchNorm2d(planes * 4))
            layers = [_Bottleneck(self.inplanes, planes, stride, downsample)]
            self.inplanes = planes * 4
            for _ in range(1, blocks):
                layers.append(_Bottleneck(self.inplanes, planes))
            return nn.Sequential(*layers)

        def forward(self, x):
            x = self.maxpool(self.relu(self.bn1(self.conv1(x))))
            x = self.layer4(self.layer3(self.layer2(self.layer1(x))))
            return self.fc(torch.flatten(self.avgpool(x), 1))

    def resnet50(pretrained=False, **kw):
        return _ResNet()

    models.resnet50 = resnet50

    class IntermediateLayerGetter(nn.ModuleDict):
        def __init__(self, model, return_layers):
            orig = {str(k): str(v) for k, v in return_layers.items()}
            layers = {}
            rl = dict(orig)
            for name, module in model.named_children():
                layers[name] = module
                if name in rl:
                    del rl[name]
                if not rl:
                    break
            super().__init__(layers)
            self.return_layers = orig

        def forward(self, x):
            out = {}
            for name, module in self.items():
                x = module(x)
                if name in self.return_layers:
                    out[self.return_layers[name]] = x
            return out

    mutils.IntermediateLayerGetter = IntermediateLayerGetter
    tvutils.make_grid = lambda *a, **k: (_ for _ in ()).throw(
        NotImplementedError('make_grid stub'))

    tv.ops = ops
    tv.models = models
    models._utils = mutils
    tv.utils = tvutils
    sys.modules['torchvision'] = tv
    sys.modules['torchvision.ops'] = ops
    sys.modules['torchvision.models'] = models
    sys.modules['torchvision.models._utils'] = mutils
    sys.modules['torchvision.utils'] = tvutils


def load_retinaface_utils():
    """Reference retinaface_utils (PriorBox, decode, nms helpers)."""
    _fake_torchvision()
    return _load(
        'ref_retinaface_utils',
        f'{REF}/facelib/detection/retinaface/retinaface_utils.py')


def load_facelib_detection():
    """Import the reference RetinaFace / ParseNet stack with stubs.

    Returns (retinaface_module, parsenet_module)."""
    _fake_torchvision()
    _fake_basicsr()
    import logging
    utils_mod = sys.modules['basicsr.utils']
    misc = types.ModuleType('basicsr.utils.misc')
    misc.get_device = lambda *a, **k: __import__('torch').device('cpu')
    misc.get_root_logger = lambda *a, **k: logging.getLogger('ref')
    sys.modules['basicsr.utils.misc'] = misc
    utils_mod.misc = misc
    if REF not in sys.path:
        sys.path.insert(0, REF)
    import facelib.detection.retinaface.retinaface as rf
    import facelib.parsing.parsenet as pn
    return rf, pn


def load_rrdbnet():
    """Reference RRDBNet (needs arch_util with dcn/torchvision stubs)."""
    _fake_basicsr()
    _fake_torchvision()
    if 'basicsr.ops.dcn' not in sys.modules:
        ops = types.ModuleType('basicsr.ops')
        dcn = types.ModuleType('basicsr.ops.dcn')
        dcn.ModulatedDeformConvPack = object
        dcn.modulated_deform_conv = lambda *a, **k: None
        sys.modules['basicsr.ops'] = ops
        sys.modules['basicsr.ops.dcn'] = dcn
    _load('basicsr.archs.arch_util',
          f'{REF}/basicsr/archs/arch_util.py')
    return _load('basicsr.archs.rrdbnet_arch',
                 f'{REF}/basicsr/archs/rrdbnet_arch.py')


def load_face_restoration_helper():
    """Import the reference FaceRestoreHelper (detection + parsing +
    cv2 paste-back) with the torchvision/basicsr stubs. Weights must
    already exist under ./weights/facelib relative to the cwd (this
    environment has zero egress, so the URL fetch path resolves to the
    local file or raises)."""
    import os
    from urllib.parse import urlparse

    import torch

    _fake_torchvision()
    _fake_basicsr()
    tv = sys.modules['torchvision']
    if 'torchvision.transforms' not in sys.modules:
        transforms = types.ModuleType('torchvision.transforms')
        tfunc = types.ModuleType('torchvision.transforms.functional')

        def normalize(t, mean, std, inplace=False):
            if not inplace:
                t = t.clone()
            m = torch.as_tensor(mean, dtype=t.dtype).view(-1, 1, 1)
            s = torch.as_tensor(std, dtype=t.dtype).view(-1, 1, 1)
            return t.sub_(m).div_(s)

        tfunc.normalize = normalize
        transforms.functional = tfunc
        sys.modules['torchvision.transforms'] = transforms
        sys.modules['torchvision.transforms.functional'] = tfunc
        tv.transforms = transforms
    utils_mod = sys.modules['basicsr.utils']
    if 'basicsr.utils.misc' not in sys.modules:
        misc = types.ModuleType('basicsr.utils.misc')
        misc.get_device = lambda *a, **k: torch.device('cpu')
        misc.get_root_logger = lambda *a, **k: logging.getLogger('ref')
        sys.modules['basicsr.utils.misc'] = misc
        utils_mod.misc = misc
    if 'basicsr.utils.download_util' not in sys.modules:
        du = types.ModuleType('basicsr.utils.download_util')

        def load_file_from_url(url, model_dir=None, progress=True,
                               file_name=None):
            fname = file_name or os.path.basename(urlparse(url).path)
            path = os.path.abspath(os.path.join(model_dir or '.', fname))
            if not os.path.exists(path):
                raise FileNotFoundError(
                    f'{path} not found and this environment has no '
                    f'egress (wanted {url})')
            return path

        du.load_file_from_url = load_file_from_url
        sys.modules['basicsr.utils.download_util'] = du
        utils_mod.download_util = du
    if REF not in sys.path:
        sys.path.insert(0, REF)
    import facelib.utils.face_restoration_helper as frh

    # facelib.utils.misc.load_file_from_url anchors model_dir at the
    # REFERENCE repo root (misc.py ROOT_DIR) and downloads on miss;
    # /root/reference is read-only and this environment has no egress.
    # Point it at ./weights relative to the cwd instead (parity_check's
    # weights_cwd) and fail loudly when the file is absent.
    def _local_load_file_from_url(url, model_dir=None, progress=True,
                                  file_name=None, save_dir=None):
        fname = file_name or os.path.basename(urlparse(url).path)
        path = os.path.abspath(os.path.join(save_dir or model_dir or '.',
                                            fname))
        if not os.path.exists(path):
            raise FileNotFoundError(
                f'{path} not found and this environment has no egress '
                f'(wanted {url})')
        return path

    import facelib.detection as fdet
    import facelib.parsing as fpar
    import facelib.utils.misc as fmisc
    for mod in (fmisc, fdet, fpar, frh):
        if hasattr(mod, 'load_file_from_url'):
            mod.load_file_from_url = _local_load_file_from_url
    return frh


def load_reference_archs():
    """Returns (vqgan_arch_module, codeformer_arch_module) from the
    reference repository, importable without torchvision/lpips."""
    _fake_basicsr()
    vqgan = _load('basicsr.archs.vqgan_arch',
                  f'{REF}/basicsr/archs/vqgan_arch.py')
    codeformer = _load('basicsr.archs.codeformer_arch',
                       f'{REF}/basicsr/archs/codeformer_arch.py')
    return vqgan, codeformer
