"""Load reference (PyTorch) modules from /root/reference as parity oracles.

The reference repo is mounted read-only and has dependencies that are absent
here (torchvision, yacs, timm). This helper installs minimal stand-in modules
for exactly the symbols the oracle paths touch, then imports the reference
package modules so tests can compare our JAX implementations against the
original semantics — without copying any reference code into this repo.
"""

from __future__ import annotations

import importlib
import sys
import types

REF_ROOT = "/root/reference"


def _stub_torchvision():
    if "torchvision" in sys.modules:
        return
    import torch

    tv = types.ModuleType("torchvision")
    ops = types.ModuleType("torchvision.ops")
    boxes = types.ModuleType("torchvision.ops.boxes")

    def box_area(b):  # xyxy
        return (b[:, 2] - b[:, 0]) * (b[:, 3] - b[:, 1])

    boxes.box_area = box_area
    ops.boxes = boxes

    models = types.ModuleType("torchvision.models")
    video = types.ModuleType("torchvision.models.video")
    vres = types.ModuleType("torchvision.models.video.resnet")
    vres.VideoResNet = object
    video.resnet = vres
    models.video = video
    models._utils = types.ModuleType("torchvision.models._utils")
    models._utils.IntermediateLayerGetter = object

    tf = types.ModuleType("torchvision.transforms")
    tfunc = types.ModuleType("torchvision.transforms.functional")

    # Minimal faithful implementations of the torchvision functional API the
    # reference transforms call (PIL-backed), so the reference box-transform
    # math can run as an oracle.
    import numpy as _np
    from PIL import Image as _Image

    def _crop(img, top, left, height, width):
        return img.crop((left, top, left + width, top + height))

    def _hflip(img):
        return img.transpose(_Image.FLIP_LEFT_RIGHT)

    def _resize(img, size, *a, **k):
        if isinstance(size, (list, tuple)):
            h, w = size
        else:
            ow, oh = img.size
            if ow < oh:
                w, h = size, int(size * oh / ow)
            else:
                h, w = size, int(size * ow / oh)
        return img.resize((int(w), int(h)), _Image.BILINEAR)

    def _to_tensor(img):
        arr = _np.asarray(img, dtype=_np.float32) / 255.0
        return torch.from_numpy(arr.transpose(2, 0, 1).copy())

    def _normalize(t, mean, std, *a, **k):
        mean = torch.tensor(mean).view(-1, 1, 1)
        std = torch.tensor(std).view(-1, 1, 1)
        return (t - mean) / std

    tfunc.crop = _crop
    tfunc.hflip = _hflip
    tfunc.resize = _resize
    tfunc.to_tensor = _to_tensor
    tfunc.normalize = _normalize
    tf.functional = tfunc

    tv.ops = ops
    tv.models = models
    tv.transforms = tf
    tv.__version__ = "0.0-stub"
    for name, mod in {
        "torchvision": tv,
        "torchvision.ops": ops,
        "torchvision.ops.boxes": boxes,
        "torchvision.models": models,
        "torchvision.models.video": video,
        "torchvision.models.video.resnet": vres,
        "torchvision.models._utils": models._utils,
        "torchvision.transforms": tf,
        "torchvision.transforms.functional": tfunc,
    }.items():
        sys.modules[name] = mod


def load_ref(module: str):
    """Import e.g. 'models.transformer.position_encoding' from the reference."""
    _stub_torchvision()
    if REF_ROOT not in sys.path:
        sys.path.insert(0, REF_ROOT)
    return importlib.import_module(module)
