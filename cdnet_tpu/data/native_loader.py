"""ctypes bindings for the native host-side batch assembler.

`native/host_ops.cpp` fuses random-crop + flips + color jitter + dtype
conversion into one multi-threaded pass per batch (the first-party native
equivalent of the reference's 8 DataLoader worker processes, SURVEY.md §2.4).
Falls back to the pure-NumPy path transparently when the .so isn't built
(`make -C native`).
"""
from __future__ import annotations

import ctypes
import os

import numpy as np

_LIB_PATH = os.path.join(os.path.dirname(__file__), "..", "..", "native",
                         "libcdnet_host.so")
# None = not probed yet; False = force/record the NumPy fallback (tests set
# this to compare native vs fallback for real — the old None sentinel made
# "forced fallback" indistinguishable from "not loaded yet", so the parity
# tests silently compared native against native); a CDLL once loaded.
_lib = None


def available() -> bool:
    return _load() is not None


def _load():
    global _lib
    if _lib is False:
        return None
    if _lib is not None:
        return _lib
    if not os.path.exists(_LIB_PATH):
        _lib = False
        return None
    lib = ctypes.CDLL(_LIB_PATH)
    lib.cdnet_assemble_batch.restype = ctypes.c_int
    lib.cdnet_warp_nearest.restype = ctypes.c_int
    _lib = lib
    return _lib


def assemble_batch(samples, crop: int, rng: np.random.RandomState,
                   jitter: float = 0.5, n_threads: int = 8):
    """samples: list of (img uint8 HWC, weight uint8 HW, inst int32 HW) tiles
    (all same shape). Returns device-ready float32/int32 batch dict.

    Augmentation distribution parity with the host transforms: crop origin
    uniform, flips p=0.5 each, brightness/contrast factors 1 + (U-0.5)*jitter.
    """
    lib = _load()
    n = len(samples)
    h, w = samples[0][0].shape[:2]
    imgs = [np.ascontiguousarray(s[0], np.uint8) for s in samples]
    weights = [np.ascontiguousarray(s[1], np.uint8) for s in samples]
    insts = [np.ascontiguousarray(s[2], np.int32) for s in samples]

    crop_y = rng.randint(0, h - crop + 1, n).astype(np.int32)
    crop_x = rng.randint(0, w - crop + 1, n).astype(np.int32)
    hflip = (rng.rand(n) < 0.5).astype(np.int32)
    vflip = (rng.rand(n) < 0.5).astype(np.int32)
    brightness = (1 + (rng.rand(n) - 0.5) * jitter).astype(np.float32)
    contrast = (1 + (rng.rand(n) - 0.5) * jitter).astype(np.float32)

    out_imgs = np.empty((n, crop, crop, 3), np.float32)
    out_weights = np.empty((n, crop, crop), np.float32)
    out_insts = np.empty((n, crop, crop), np.int32)

    if lib is None:
        for i in range(n):
            y, x = crop_y[i], crop_x[i]
            im = imgs[i][y:y + crop, x:x + crop].astype(np.float32) / 255.0
            wm = weights[i][y:y + crop, x:x + crop].astype(np.float32)
            it = insts[i][y:y + crop, x:x + crop]
            if hflip[i]:
                im, wm, it = im[:, ::-1], wm[:, ::-1], it[:, ::-1]
            if vflip[i]:
                im, wm, it = im[::-1], wm[::-1], it[::-1]
            # contrast pivot = RAW crop mean, computed BEFORE brightness —
            # the native pass (host_ops.cpp process_sample) pre-computes the
            # mean from the uint8 crop and then applies brightness per pixel
            mean = im.mean()
            im = im * brightness[i]
            im = np.clip((im - mean) * contrast[i] + mean, 0, 1)
            out_imgs[i], out_weights[i], out_insts[i] = im, wm, it
        return {"image": out_imgs, "weight": out_weights, "instance": out_insts}

    u8p = ctypes.POINTER(ctypes.c_uint8)
    i32p = ctypes.POINTER(ctypes.c_int32)
    img_ptrs = (u8p * n)(*[a.ctypes.data_as(u8p) for a in imgs])
    w_ptrs = (u8p * n)(*[a.ctypes.data_as(u8p) for a in weights])
    i_ptrs = (i32p * n)(*[a.ctypes.data_as(i32p) for a in insts])
    rc = lib.cdnet_assemble_batch(
        img_ptrs, w_ptrs, i_ptrs, n, h, w,
        crop_y.ctypes.data_as(i32p), crop_x.ctypes.data_as(i32p),
        ctypes.c_int(crop),
        hflip.ctypes.data_as(i32p), vflip.ctypes.data_as(i32p),
        brightness.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        contrast.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        out_imgs.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        out_weights.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        out_insts.ctypes.data_as(i32p),
        ctypes.c_int(n_threads))
    if rc != 0:
        raise RuntimeError(f"cdnet_assemble_batch failed: rc={rc}")
    return {"image": out_imgs, "weight": out_weights, "instance": out_insts}


def warp_nearest(img: np.ndarray, weight: np.ndarray, inst: np.ndarray,
                 src_y: np.ndarray, src_x: np.ndarray):
    """Nearest-neighbor displacement warp (elastic-transform inner loop)."""
    lib = _load()
    h, w = inst.shape
    if lib is None:
        # floor(x + 0.5) == the native path's round-half-up (host_ops.cpp
        # uses floorf; np.rint's banker's rounding differs on half-integers
        # and plain (int) truncation differs on negatives)
        sy = np.clip(np.floor(src_y + 0.5).astype(np.int64), -1, h)
        sx = np.clip(np.floor(src_x + 0.5).astype(np.int64), -1, w)
        inb = (sy >= 0) & (sy < h) & (sx >= 0) & (sx < w)
        syc, sxc = np.clip(sy, 0, h - 1), np.clip(sx, 0, w - 1)
        oi = np.where(inb[..., None], img[syc, sxc], 0).astype(np.uint8)
        ow = np.where(inb, weight[syc, sxc], 0).astype(np.uint8)
        oin = np.where(inb, inst[syc, sxc], 0).astype(np.int32)
        return oi, ow, oin
    img = np.ascontiguousarray(img, np.uint8)
    weight = np.ascontiguousarray(weight, np.uint8)
    inst = np.ascontiguousarray(inst, np.int32)
    src_y = np.ascontiguousarray(src_y, np.float32)
    src_x = np.ascontiguousarray(src_x, np.float32)
    out_img = np.empty_like(img)
    out_weight = np.empty_like(weight)
    out_inst = np.empty_like(inst)
    f32p = ctypes.POINTER(ctypes.c_float)
    u8p = ctypes.POINTER(ctypes.c_uint8)
    i32p = ctypes.POINTER(ctypes.c_int32)
    rc = lib.cdnet_warp_nearest(
        img.ctypes.data_as(u8p), weight.ctypes.data_as(u8p),
        inst.ctypes.data_as(i32p), ctypes.c_int(h), ctypes.c_int(w),
        src_y.ctypes.data_as(f32p), src_x.ctypes.data_as(f32p),
        out_img.ctypes.data_as(u8p), out_weight.ctypes.data_as(u8p),
        out_inst.ctypes.data_as(i32p))
    if rc != 0:
        raise RuntimeError(f"cdnet_warp_nearest failed: rc={rc}")
    return out_img, out_weight, out_inst
