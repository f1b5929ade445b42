"""Make `/root/reference` importable as a numerics ORACLE for parity tests.

The reference (PyTorch/NumPy) is installed-dependency-incomplete in this
image: numba, skimage, albumentations and SimpleITK are absent, and it uses
numpy<1.24 aliases (np.float/np.int). This module installs faithful shims —
skimage morphology/measure/watershed re-implemented on scipy + heapq with the
documented skimage semantics — so the reference's own LabelEncoding,
generate_dd_map, postproc, metrics and losses run unmodified and serve as
golden oracles for cdnet_tpu.

The shims are TEST-ONLY code: nothing in cdnet_tpu imports this module.
"""
from __future__ import annotations

import heapq
import sys
import types

import numpy as np
import scipy.ndimage as ndi

REFERENCE = "/root/reference"


# ---------------------------------------------------------------- skimage --

def disk(radius: int) -> np.ndarray:
    """skimage.morphology.disk: x^2 + y^2 <= r^2."""
    r = int(radius)
    y, x = np.ogrid[-r:r + 1, -r:r + 1]
    return (x * x + y * y <= r * r).astype(np.uint8)


_CROSS = disk(1)  # default footprint for grey dilation/erosion (connectivity 1)


def _grey(img, selem, op):
    img = np.asarray(img)
    fp = np.asarray(selem if selem is not None else _CROSS, bool)
    # skimage treats out-of-image pixels as the identity of the operation
    pad = max(fp.shape) // 2
    fill = img.min() if op == "max" else img.max()
    padded = np.pad(img, pad, constant_values=fill)
    out = (ndi.maximum_filter if op == "max" else ndi.minimum_filter)(
        padded, footprint=fp)
    return out[pad:-pad, pad:-pad].astype(img.dtype)


def dilation(image, selem=None, footprint=None):
    return _grey(image, footprint if footprint is not None else selem, "max")


def erosion(image, selem=None, footprint=None):
    return _grey(image, footprint if footprint is not None else selem, "min")


def remove_small_objects(ar, min_size=64, connectivity=1):
    """skimage semantics: bool input is CC-labeled; *integer input is treated
    as an already-labeled image* (all equal ids form one object)."""
    ar = np.asarray(ar)
    out = ar.copy()
    if ar.dtype == bool:
        structure = ndi.generate_binary_structure(ar.ndim, connectivity)
        ccs, _ = ndi.label(ar, structure)
    else:
        ccs = ar
    sizes = np.bincount(ccs.ravel())
    too_small = sizes < min_size
    too_small[0] = False
    out[too_small[ccs]] = 0
    return out


def measure_label(label_image, background=0, connectivity=2, return_num=False):
    """skimage.measure.label: connect equal-valued neighbors (8-conn default).

    Ids are assigned in raster order of each region's first pixel, matching
    skimage, so downstream per-id iteration order is preserved.
    """
    label_image = np.asarray(label_image)
    structure = ndi.generate_binary_structure(2, connectivity)
    regions = np.zeros(label_image.shape, np.int64)
    n_total = 0
    # label each value class separately, then renumber globally by raster
    # order of first occurrence
    pieces = []
    for v in np.unique(label_image):
        if v == background:
            continue
        lab, n = ndi.label(label_image == v, structure)
        for k in range(1, n + 1):
            mask = lab == k
            first = np.flatnonzero(mask.ravel())[0]
            pieces.append((first, mask))
    pieces.sort(key=lambda t: t[0])
    for i, (_, mask) in enumerate(pieces, start=1):
        regions[mask] = i
        n_total = i
    if return_num:
        return regions, n_total
    return regions


def watershed(image, markers, mask=None, connectivity=1, watershed_line=False,
              compactness=0.0):
    """Meyer's flooding exactly as skimage: min-heap keyed (value, age, idx);
    FIFO age breaks plateau ties in insertion order; 4-connected default."""
    image = np.asarray(image, np.float64)
    out = np.asarray(markers).astype(np.int64).copy()
    if mask is None:
        mask = np.ones(out.shape, bool)
    mask = np.asarray(mask, bool)
    out[~mask] = 0
    h, w = out.shape
    nbrs = ((-1, 0), (1, 0), (0, -1), (0, 1)) if connectivity == 1 else \
           ((-1, -1), (-1, 0), (-1, 1), (0, -1), (0, 1), (1, -1), (1, 0), (1, 1))
    heap = []
    age = 0
    it = np.nditer(out, flags=["multi_index"])
    for val in it:
        if val != 0:
            i, j = it.multi_index
            heapq.heappush(heap, (image[i, j], age, i, j))
            age += 1
    while heap:
        _, _, i, j = heapq.heappop(heap)
        lab = out[i, j]
        for di, dj in nbrs:
            ni, nj = i + di, j + dj
            if 0 <= ni < h and 0 <= nj < w and mask[ni, nj] and out[ni, nj] == 0:
                out[ni, nj] = lab
                heapq.heappush(heap, (image[ni, nj], age, ni, nj))
                age += 1
    return out


def _module(name, **attrs):
    mod = types.ModuleType(name)
    for k, v in attrs.items():
        setattr(mod, k, v)
    sys.modules[name] = mod
    return mod


def _any_attr_module(name):
    mod = types.ModuleType(name)

    def _getattr(attr):
        if attr.startswith("__"):
            raise AttributeError(attr)
        return lambda *a, **k: None
    mod.__getattr__ = _getattr
    sys.modules[name] = mod
    return mod


_installed = False


def install() -> None:
    """Install shims + reference path. Idempotent."""
    global _installed
    if _installed:
        return
    _installed = True

    # numpy<1.24 aliases the reference relies on
    for alias, typ in (("float", float), ("int", int), ("bool", bool),
                       ("complex", complex)):
        if alias not in np.__dict__:
            setattr(np, alias, typ)

    # let reference .cuda() calls run on CPU torch (loss.py CenterLoss etc.)
    import torch
    torch.Tensor.cuda = lambda self, *a, **k: self
    torch.nn.Module.cuda = lambda self, *a, **k: self

    # numba: pass-through @jit (runs get_centerpoint2 as pure python)
    def jit(*args, **kwargs):
        if args and callable(args[0]):
            return args[0]
        return lambda f: f
    _module("numba", jit=jit, njit=jit)

    # skimage on scipy
    sk = _module("skimage")
    sk.__path__ = []  # mark as package so `import skimage.x.y` resolves
    selem_ns = types.SimpleNamespace(disk=disk)
    sk.morphology = _module(
        "skimage.morphology", disk=disk, dilation=dilation, erosion=erosion,
        remove_small_objects=remove_small_objects, watershed=watershed,
        selem=selem_ns, label=measure_label,
        binary_dilation=lambda a, footprint=None: dilation(
            np.asarray(a, bool), footprint).astype(bool),
        binary_erosion=lambda a, footprint=None: erosion(
            np.asarray(a, bool), footprint).astype(bool))
    sk.measure = _module("skimage.measure", label=measure_label)
    sk.segmentation = _module("skimage.segmentation", watershed=watershed)
    sk.io = _module("skimage.io", imread=None, imsave=lambda *a, **k: None)
    sk.color = _any_attr_module("skimage.color")
    sk.feature = _any_attr_module("skimage.feature")
    sk.filters = _module("skimage.filters")
    sk.filters.__path__ = []
    sk.filters.rank = _any_attr_module("skimage.filters.rank")
    for sub in ("morphology", "measure", "segmentation", "io", "color",
                "feature", "filters"):
        sys.modules[f"skimage.{sub}"].__package__ = "skimage"

    _any_attr_module("SimpleITK")
    _any_attr_module("albumentations")

    # torchvision: only models.vgg16_bn(...).features is exercised by the
    # reference's model_unet_rev1 (get_backbone, model_unet_rev1.py:40-41).
    # Build the exact torchvision layout (cfg "D" + BN: Sequential indices
    # 0..43, conv/bn/relu triples + pools) so named_children/state_dict keys
    # match the real library.
    def _vgg16_bn(pretrained=False, **_kw):
        import torch.nn as nn
        cfg = [64, 64, "M", 128, 128, "M", 256, 256, 256, "M",
               512, 512, 512, "M", 512, 512, 512, "M"]
        layers, in_c = [], 3
        for v in cfg:
            if v == "M":
                layers.append(nn.MaxPool2d(2, 2))
            else:
                layers += [nn.Conv2d(in_c, v, 3, padding=1),
                           nn.BatchNorm2d(v), nn.ReLU(inplace=True)]
                in_c = v
        return types.SimpleNamespace(features=nn.Sequential(*layers))

    tv = _module("torchvision")
    tv.__path__ = []
    tv.models = _module("torchvision.models", vgg16_bn=_vgg16_bn)
    tv.datasets = _any_attr_module("torchvision.datasets")
    tv.transforms = _any_attr_module("torchvision.transforms")
    for sub in ("models", "datasets", "transforms"):
        sys.modules[f"torchvision.{sub}"].__package__ = "torchvision"

    if REFERENCE not in sys.path:
        sys.path.insert(0, REFERENCE)
