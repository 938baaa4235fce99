"""Load the reference PyTorch model stack on CPU under modern torch.

The reference (torch-0.4-era, python2-flavoured, CUDA-assumed) cannot be
imported as-is: it allocates CUDA tensors at import time
(``modules/utils.py:11-13``), constructs ``.cuda()`` losses at class scope
(``attenet2.py:40,44``), uses the py3.7+ keyword ``async`` as an argument
name (``model.py:221-225``), depends on visdom/cv2/skimage/lmdb (not
installed here), and its ``archs/__init__.py`` imports a missing module.

This shim makes the reference runnable for PARITY EXPERIMENTS ONLY
(BASELINE.md config #1/#4): fake the missing services, re-route
``.cuda()`` to the identity, and source-patch the two genuine syntax
blockers.  Nothing here changes reference semantics on CPU.

Usage:
    from tools.reference_shim import load_reference
    ref = load_reference()        # namespace: ReSeg, Model, config, ...
"""

from __future__ import annotations

import importlib
import os
import sys
import types

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)

_CODE = "/root/reference/code"
_PATHS = [
    _CODE,
    _CODE + "/lib",
    _CODE + "/lib/archs",
    _CODE + "/lib/losses",
    _CODE + "/lib/archs/modules",
    _CODE + "/settings/CVPPP",
]


def _fake_visdom():
    mod = types.ModuleType("visdom")

    class Visdom:
        def __init__(self, *a, **k):
            pass

        def line(self, *a, **k):
            return None

        def images(self, *a, **k):
            return None

        def close(self, *a, **k):
            return None

    mod.Visdom = Visdom
    return mod


def _fake_cv2():
    mod = types.ModuleType("cv2")
    mod.INTER_NEAREST = 0
    mod.INTER_LINEAR = 1

    def imwrite(path, img, *a, **k):
        return True  # debug-image dumps are dropped

    def resize(img, dsize, interpolation=0):
        import numpy as np
        from PIL import Image

        pil = Image.fromarray(np.asarray(img))
        resample = Image.NEAREST if interpolation == 0 else Image.BILINEAR
        return np.array(pil.resize(dsize, resample))

    def applyColorMap(img, *a, **k):
        import numpy as np

        g = np.asarray(img)
        return np.stack([g, g, g], axis=-1)

    mod.imwrite = imwrite
    mod.resize = resize
    mod.applyColorMap = applyColorMap
    mod.COLORMAP_JET = 2
    return mod


def _fake_skimage():
    """numpy color conversions backed by tpuseg's own (parity-tested)
    colorspace math — both sides of a parity run then share one
    preprocessing definition."""
    import numpy as np

    import tpuseg.data.colorspace as C

    sk = types.ModuleType("skimage")
    color = types.ModuleType("skimage.color")

    def _wrap01(fn):
        # tpuseg conversions take HxWx3 float in [0,1]
        def conv(img):
            arr = np.asarray(img, np.float32)
            return np.asarray(fn(arr))

        return conv

    color.rgb2lab = _wrap01(C.rgb2lab)
    color.rgb2hsv = _wrap01(C.rgb2hsv)
    color.rgb2yuv = _wrap01(C.rgb2yuv)
    color.rgb2ycbcr = _wrap01(C.rgb2ycbcr)
    color.rgb2hed = _wrap01(C.rgb2hed)
    color.rgb2yiq = _wrap01(C.rgb2yiq)

    def _unused(name):
        def fn(*a, **k):
            raise NotImplementedError(
                f"skimage.color.{name} shim: inverse conversions are not "
                "exercised by the parity paths"
            )

        return fn

    for name in ("lab2rgb", "yuv2rgb", "ycbcr2rgb", "hsv2rgb", "rgb2xyz",
                 "xyz2rgb", "hed2rgb"):
        setattr(color, name, _unused(name))
    sk.color = color
    sys.modules["skimage"] = sk
    sys.modules["skimage.color"] = color
    return sk


def _fake_torchvision():
    """Minimal torchvision surface the reference touches: transforms used
    by the preprocessing pipelines (utils.py:27-83) and a models dict for
    the dormant VGG16 wrapper (vgg16.py:55, unused on the live path)."""
    import numpy as np
    import torch

    tv = types.ModuleType("torchvision")
    transforms = types.ModuleType("torchvision.transforms")

    class Compose:
        def __init__(self, ts):
            self.ts = ts

        def __call__(self, x):
            for t in self.ts:
                x = t(x)
            return x

    class ToTensor:
        def __call__(self, pic):
            arr = np.asarray(pic)
            if arr.ndim == 2:
                arr = arr[:, :, None]
            t = torch.from_numpy(arr.transpose(2, 0, 1).copy()).contiguous()
            if arr.dtype == np.uint8:
                return t.float().div(255.0)
            return t.float()

    class Normalize:
        def __init__(self, mean, std):
            self.mean = torch.tensor(mean).view(-1, 1, 1)
            self.std = torch.tensor(std).view(-1, 1, 1)

        def __call__(self, t):
            return (t - self.mean) / self.std

    class Resize:
        def __init__(self, size, interpolation=2):
            self.size = size
            self.interpolation = interpolation

        def __call__(self, img):
            from PIL import Image

            h, w = self.size
            return img.resize((w, h), self.interpolation)

    class _Unavailable:
        def __init__(self, *a, **k):
            raise NotImplementedError("torchvision shim: not exercised")

    transforms.Compose = Compose
    transforms.ToTensor = ToTensor
    transforms.Normalize = Normalize
    transforms.Resize = Resize
    transforms.ColorJitter = _Unavailable
    transforms.RandomGrayscale = _Unavailable

    models = types.ModuleType("torchvision.models")

    def _no_vgg(pretrained=False, **k):
        raise NotImplementedError("torchvision shim: vgg16 weights not "
                                  "available (dormant path)")

    models.__dict__["vgg16"] = _no_vgg
    tv.transforms = transforms
    tv.models = models
    sys.modules["torchvision"] = tv
    sys.modules["torchvision.transforms"] = transforms
    sys.modules["torchvision.models"] = models
    return tv


def _patch_torch_cpu():
    import torch

    def _self(self, *a, **k):
        return self

    torch.Tensor.cuda = _self
    torch.nn.Module.cuda = _self
    if hasattr(torch, "cuda"):
        torch.cuda.is_available = lambda: False

    # torch-0.4-era API compatibility: uint8 masks were legal masks then
    if not getattr(torch.Tensor.masked_fill, "__tpuseg_shim__", False):
        _mf = torch.Tensor.masked_fill
        _mf_ = torch.Tensor.masked_fill_

        def masked_fill(self, mask, value):
            return _mf(self, mask.bool() if mask.dtype != torch.bool else mask,
                       value)

        def masked_fill_(self, mask, value):
            return _mf_(self, mask.bool() if mask.dtype != torch.bool else mask,
                        value)

        masked_fill.__tpuseg_shim__ = True
        masked_fill_.__tpuseg_shim__ = True
        torch.Tensor.masked_fill = masked_fill
        torch.Tensor.masked_fill_ = masked_fill_

    # torch>=2.4 removed ReduceLROnPlateau(verbose=...) (model.py:164-166)
    sched = torch.optim.lr_scheduler.ReduceLROnPlateau
    if not getattr(sched, "__tpuseg_shim__", False):
        class ReduceLROnPlateau(sched):  # noqa: N801
            __tpuseg_shim__ = True

            def __init__(self, *a, verbose=False, **k):
                super().__init__(*a, **k)

        torch.optim.lr_scheduler.ReduceLROnPlateau = ReduceLROnPlateau
    return torch


def _load_patched_module(name: str, path: str, replacements):
    src = open(path).read()
    for old, new in replacements:
        src = src.replace(old, new)
    mod = types.ModuleType(name)
    mod.__file__ = path
    sys.modules[name] = mod
    exec(compile(src, path, "exec"), mod.__dict__)
    return mod


def load_reference():
    """Returns a namespace with the reference's live classes, importable and
    runnable on CPU torch 2.x.  Parity harnesses drive Model/ReSeg directly
    with their own batch iterators (bypassing lmdb/DataLoader)."""
    for p in _PATHS:
        if p not in sys.path:
            sys.path.insert(0, p)

    # force jax to CPU before anything imports it transitively (this box
    # pins JAX_PLATFORMS=axon; the TPU tunnel is single-process)
    import jax

    if "axon" in str(jax.config.jax_platforms or ""):
        jax.config.update("jax_platforms", "cpu")

    sys.modules.setdefault("visdom", _fake_visdom())
    sys.modules.setdefault("cv2", _fake_cv2())
    if "skimage" not in sys.modules:
        _fake_skimage()
    if "torchvision" not in sys.modules:
        _fake_torchvision()
    _patch_torch_cpu()

    # the reference's flat 'losses' package (same dance as
    # tests/reference_import.py — circular dice<->multi_loss imports)
    if "losses" not in sys.modules:
        multi_loss = importlib.import_module("multi_loss")
        pkg = types.ModuleType("losses")
        pkg.__path__ = [_CODE + "/lib/losses"]
        pkg.__tpuseg_shim__ = True
        sys.modules["losses"] = pkg
        sys.modules["losses.multi_loss"] = multi_loss
        pkg.multi_loss = multi_loss
    dice = importlib.import_module("dice")
    sys.modules["losses.dice"] = dice
    losses_pkg = sys.modules["losses"]
    losses_pkg.dice = dice
    for sym in ("DiceLoss", "DiceCoefficient", "MatchLoss"):
        setattr(losses_pkg, sym, getattr(dice, sym))
    lovasz = importlib.import_module("lovasz_losses")
    sys.modules["losses.lovasz_losses"] = lovasz
    losses_pkg.lovasz_losses = lovasz
    discriminative = importlib.import_module("discriminative")
    losses_pkg.DiscriminativeLoss = discriminative.DiscriminativeLoss
    losses_pkg.FocalLoss = sys.modules["losses.multi_loss"].FocalLoss

    # 'modules' package alias so `from modules.utils import ...` works
    if "modules" not in sys.modules:
        modpkg = types.ModuleType("modules")
        modpkg.__path__ = [_CODE + "/lib/archs/modules"]
        sys.modules["modules"] = modpkg

    # two files are named utils.py; the flat name 'utils' must resolve to
    # lib/utils.py (attenet2.py:10), with modules/utils.py reachable as
    # 'modules.utils' — load lib/utils.py explicitly under 'utils'.
    if "utils" not in sys.modules:
        spec = importlib.util.spec_from_file_location(
            "utils", _CODE + "/lib/utils.py"
        )
        lib_utils = importlib.util.module_from_spec(spec)
        sys.modules["utils"] = lib_utils
        spec.loader.exec_module(lib_utils)

    # AlphaEntropy's clamp upper bound is a sign typo: ``1. - 1e7`` ==
    # -9999999 (attenet2.py:77; the correct ``1. - 1e-7`` appears at
    # :191,196).  Modern torch resolves clamp(min>max) to the max, making
    # H = log(-1e7) = NaN on every training step — patch to the intended
    # bound so training-mode parity runs are meaningful.
    if "attenet2" not in sys.modules:
        att = _load_patched_module(
            "attenet2", _CODE + "/lib/archs/modules/attenet2.py",
            [("alpha.clamp(1e-7, 1. - 1e7)", "alpha.clamp(1e-7, 1. - 1e-7)")],
        )
        # reseg imports it as modules.attenet2 (reseg.py:6) — alias BOTH
        # names to the one patched module object, or patches/monkeypatches
        # would land on a twin class the live model never uses
        sys.modules["modules.attenet2"] = att
        sys.modules["modules"].attenet2 = att

    reseg = importlib.import_module("reseg")

    # fake 'archs' package: the real archs/__init__.py imports a module
    # that does not exist in the repo (SURVEY.md quirk #1)
    if "archs" not in sys.modules:
        archs = types.ModuleType("archs")
        archs.ReSeg = reseg.ReSeg
        sys.modules["archs"] = archs

    # model.py uses the py3.7+ keyword `async` as a kwarg name — a
    # SyntaxError under this interpreter; same API intent is non_blocking
    model_mod = _load_patched_module(
        "ref_model", _CODE + "/lib/model.py",
        [("async=True", "non_blocking=True"),
         ("np.Inf", "np.inf")],  # alias removed in numpy 2.0
    )

    import config as ref_config

    settings = {}
    try:
        ds = importlib.import_module("data_settings")
        ms = importlib.import_module("model_settings")
        ts = importlib.import_module("training_settings")
        settings = {
            "DataSettings": ds.DataSettings,
            "ModelSettings": ms.ModelSettings,
            "TrainingSettings": ts.TrainingSettings,
        }
    except Exception as e:  # settings are optional for forward parity
        settings = {"error": repr(e)}

    return types.SimpleNamespace(
        ReSeg=reseg.ReSeg,
        Model=model_mod.Model,
        config=ref_config,
        dice=dice,
        modules_utils=importlib.import_module("utils"),
        attenet2=importlib.import_module("attenet2"),
        settings=settings,
    )


if __name__ == "__main__":
    ref = load_reference()
    print("reference loaded:", ref.ReSeg, ref.Model)
