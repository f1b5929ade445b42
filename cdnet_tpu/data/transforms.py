"""Host-side joint augmentations (image + weight map + instance label).

Semantics parity with the reference's default train stack
(`/root/reference/options.py:101-110`; implementations in
`my_transforms_direction.py`): random_color, random_chooseAug,
horizontal_flip, random_elastic, random_crop — then, *departing from the
reference's CPU LabelEncoding*, the instance-label crop is handed to the
device where :func:`cdnet_tpu.ops.label_synthesis.synthesize_labels` builds
the 3-class/point/direction targets batched under jit (SURVEY.md §7 step 4).

Stochastic parity note (SURVEY.md §7 hard part (d)): bit-matching another
framework's RNG is impossible; parameters are drawn from the same
distributions (enhance factors 1 + (U-0.5), blur choice quartiles, elastic
alpha=1/sigma=50/alpha_affine=50), and fixed-input golden tests pin the
deterministic pieces.
"""
from __future__ import annotations

import numpy as np
from PIL import Image, ImageEnhance, ImageFilter
from scipy.ndimage import gaussian_filter as _np_gauss
from scipy.ndimage import map_coordinates


def _to_pil(x):
    return x if isinstance(x, Image.Image) else Image.fromarray(np.asarray(x))


class RandomColor:
    """ImageEnhance Color/Brightness/Contrast/Sharpness, factors 1 + (U-0.5)
    (my_transforms_direction.py:155-181)."""

    def __init__(self, rng: np.random.RandomState):
        self.rng = rng

    def __call__(self, imgs):
        out = list(imgs)
        img = _to_pil(imgs[0])
        for enh in (ImageEnhance.Color, ImageEnhance.Brightness,
                    ImageEnhance.Contrast, ImageEnhance.Sharpness):
            img = enh(img).enhance(1 + (self.rng.rand() - 0.5))
        out[0] = img
        return tuple(out)


class RandomChooseAug:
    """p<0.25 BLUR, <0.5 GaussianBlur, <0.75 MedianFilter, else identity
    (my_transforms_direction.py:445-473)."""

    def __init__(self, rng: np.random.RandomState):
        self.rng = rng

    def __call__(self, imgs):
        p = self.rng.rand()
        out = list(imgs)
        img = _to_pil(imgs[0])
        if p < 0.25:
            out[0] = img.filter(ImageFilter.BLUR)
        elif p < 0.5:
            out[0] = img.filter(ImageFilter.GaussianBlur)
        elif p < 0.75:
            out[0] = img.filter(ImageFilter.MedianFilter)
        return tuple(out)


class RandomHorizontalFlip:
    """Flip ALL items together with p=0.5 (my_transforms_direction.py:224-241)."""

    def __init__(self, rng: np.random.RandomState):
        self.rng = rng

    def __call__(self, imgs):
        if self.rng.rand() < 0.5:
            return tuple(np.ascontiguousarray(np.asarray(i)[:, ::-1])
                         for i in imgs)
        return imgs


class RandomVerticalFlip:
    """Flip ALL items together with p=0.5 (my_transforms_direction.py:243-261)."""

    def __init__(self, rng: np.random.RandomState):
        self.rng = rng

    def __call__(self, imgs):
        if self.rng.rand() < 0.5:
            return tuple(np.ascontiguousarray(np.asarray(i)[::-1])
                         for i in imgs)
        return imgs


class RandomAffine:
    """Random centered affine with bounded coefficients, no translation
    (my_transforms_direction.py:185-222). PIL Image.transform AFFINE maps
    output coords through [a,b,c;d,e,f] to input coords."""

    def __init__(self, rng: np.random.RandomState, bound: float = 0.3):
        if bound < 0 or bound > 0.5:
            raise ValueError("Bound is invalid, should be in range [0, 0.5)")
        self.rng = rng
        self.bound = bound

    def __call__(self, imgs):
        first = _to_pil(imgs[0])
        x, y = first.size
        a = 1 + 2 * self.bound * (self.rng.rand() - 0.5)
        b = 2 * self.bound * (self.rng.rand() - 0.5)
        d = 2 * self.bound * (self.rng.rand() - 0.5)
        e = 1 + 2 * self.bound * (self.rng.rand() - 0.5)
        c = -a * x / 2 - b * y / 2 + x / 2
        f = -d * x / 2 - e * y / 2 + y / 2
        mat = [a, b, c, d, e, f]
        return tuple(
            np.asarray(_to_pil(i).transform((x, y), Image.AFFINE, mat,
                                            resample=Image.NEAREST))
            for i in imgs)


class RandomRotation:
    """Rotate all items by one random angle (my_transforms_direction.py:354-443);
    nearest resampling so label values stay exact."""

    def __init__(self, rng: np.random.RandomState, degrees: float = 90.0):
        self.rng = rng
        self.degrees = (-degrees, degrees)

    def __call__(self, imgs):
        angle = self.rng.uniform(*self.degrees)
        return tuple(
            np.asarray(_to_pil(i).rotate(angle, resample=Image.NEAREST))
            for i in imgs)


class RandomResize:
    """Scale all items by a random factor in [lb, ub]
    (my_transforms.py random_resize semantics)."""

    def __init__(self, rng: np.random.RandomState, lb: float = 0.8,
                 ub: float = 1.25):
        self.rng = rng
        self.lb, self.ub = lb, ub

    def __call__(self, imgs):
        scale = self.rng.uniform(self.lb, self.ub)
        first = _to_pil(imgs[0])
        w, h = first.size
        ow, oh = int(w * scale), int(h * scale)
        return tuple(
            np.asarray(_to_pil(i).resize((ow, oh), Image.NEAREST))
            for i in imgs)


class RandomElastic:
    """Joint elastic deformation, albumentations ElasticTransform semantics
    (alpha=1, sigma=50, alpha_affine=50, nearest interpolation, constant-0
    border; my_transforms_direction.py:284-287)."""

    def __init__(self, rng: np.random.RandomState, alpha: float = 1.0,
                 sigma: float = 50.0, alpha_affine: float = 50.0):
        self.rng = rng
        self.alpha = alpha
        self.sigma = sigma
        self.alpha_affine = alpha_affine

    def __call__(self, imgs):
        arrs = [np.asarray(i) for i in imgs]
        h, w = arrs[0].shape[:2]
        # random affine of 3 control points (albumentations style)
        center = np.float32((w, h)) / 2
        square = min(h, w) // 3
        pts1 = np.float32([center + square, center - square,
                           [center[0] + square, center[1] - square]])
        pts2 = pts1 + self.rng.uniform(
            -self.alpha_affine, self.alpha_affine, pts1.shape).astype(np.float32)
        # solve 2x3 affine M: pts2 = M @ [pts1; 1]
        a = np.concatenate([pts1, np.ones((3, 1), np.float32)], axis=1)
        m = np.linalg.solve(a, pts2).T  # (2, 3) mapping (x, y, 1) -> (x', y')
        # displacement field
        dx = _np_gauss(self.rng.uniform(-1, 1, (h, w)), self.sigma) * self.alpha
        dy = _np_gauss(self.rng.uniform(-1, 1, (h, w)), self.sigma) * self.alpha
        yy, xx = np.mgrid[0:h, 0:w].astype(np.float32)
        # inverse-map output coords through the affine (forward-apply like cv2
        # warpAffine of the inverse), then elastic jitter
        inv = np.linalg.inv(np.vstack([m, [0, 0, 1]]))[:2]
        sx = inv[0, 0] * xx + inv[0, 1] * yy + inv[0, 2] + dx
        sy = inv[1, 0] * xx + inv[1, 1] * yy + inv[1, 2] + dy
        out = []
        for arr in arrs:
            if arr.ndim == 2:
                warped = map_coordinates(arr, [sy, sx], order=0, mode="constant")
            else:
                warped = np.stack([
                    map_coordinates(arr[..., c], [sy, sx], order=0, mode="constant")
                    for c in range(arr.shape[-1])], axis=-1)
            out.append(warped)
        return tuple(out)


class RandomCrop:
    """Random (size, size) crop of all items; resizes up if input is smaller
    (my_transforms_direction.py:476-545)."""

    def __init__(self, rng: np.random.RandomState, size: int):
        self.rng = rng
        self.size = (size, size)

    def __call__(self, imgs):
        arrs = [np.asarray(i) for i in imgs]
        h, w = arrs[0].shape[:2]
        th, tw = self.size
        if th > h or tw > w:
            out = []
            for arr in arrs:
                img = _to_pil(arr)
                img = img.resize((tw, th), Image.NEAREST)
                out.append(np.asarray(img))
            return tuple(out)
        i = self.rng.randint(0, h - th + 1)
        j = self.rng.randint(0, w - tw + 1)
        return tuple(np.ascontiguousarray(a[i:i + th, j:j + tw]) for a in arrs)


class ToArrays:
    """Image -> float32 HWC in [0,1]; weight -> float32; label -> int32.

    The [0,1] scaling matches the reference ToTensor (my_transforms_direction
    .py:889-935); weight/label keep raw values (division by 20 and class
    mapping happen in the train step, train_util_dam.py:102-110)."""

    def __call__(self, imgs):
        img = np.asarray(imgs[0], dtype=np.float32)
        if img.ndim == 2:
            img = img[..., None]
        img = img / 255.0
        out = [img]
        for x in imgs[1:]:
            arr = np.asarray(x)
            if np.issubdtype(arr.dtype, np.floating):
                out.append(arr.astype(np.float32))
            else:
                out.append(arr.astype(np.int32))
        return tuple(out)


class Normalize:
    """(img - mean) / std on the image only (my_transforms_direction.py:988-1016)."""

    def __init__(self, mean, std):
        self.mean = np.asarray(mean, np.float32)
        self.std = np.asarray(std, np.float32)

    def __call__(self, imgs):
        out = list(imgs)
        out[0] = (np.asarray(imgs[0], np.float32) - self.mean) / self.std
        return tuple(out)


class Compose:
    def __init__(self, transforms):
        self.transforms = transforms

    def __call__(self, imgs):
        for t in self.transforms:
            imgs = t(imgs)
        return imgs


def load_mean_std(cfg, test: bool = False):
    """(mean, std) for Normalize from {data_dir}/{mean_std}.npy — a (2,3)
    array in [0,1] units (options.py:355,471). Returns None when
    normalization is off.

    Gating parity: at TRAIN time normalization needs 'normalize' in
    trans_train (options.py:354-355); at TEST time the reference applies it
    UNCONDITIONALLY unless '_noNorm' appears in the test save_dir
    (options.py:463-472) — the experiment name is the opt-out. Deliberate
    divergence: a missing mean_std.npy degrades to no-normalization with a
    warning instead of the reference's FileNotFoundError, so datasets
    without the file stay usable."""
    import os
    if test:
        if "_noNorm" in cfg.test.save_dir:
            return None
    elif "normalize" not in cfg.train.trans_train:
        return None
    path = os.path.join(cfg.train.data_dir, cfg.model.mean_std + ".npy")
    if test and not os.path.exists(path):
        import warnings
        warnings.warn(f"test-time normalize is on by default (no '_noNorm' "
                      f"in save_dir) but {path} is missing; proceeding "
                      f"WITHOUT normalization — the reference would crash "
                      f"here (options.py:471)")
        return None
    arr = np.load(path)
    return (np.asarray(arr[0], np.float32), np.asarray(arr[1], np.float32))


def get_transforms(names, input_size: int = 256, seed: int = 2022,
                   mean=None, std=None) -> Compose:
    """`get_transforms(param_dict)` parity (my_transforms_direction.py:1049-1071):
    build the train/val/test stack from transform names. ``label_encoding`` is
    intentionally absent — label synthesis runs on device in the train step."""
    rng = np.random.RandomState(seed)
    table = {
        "random_color": lambda: RandomColor(rng),
        "random_chooseAug": lambda: RandomChooseAug(rng),
        "horizontal_flip": lambda: RandomHorizontalFlip(rng),
        "vertical_flip": lambda: RandomVerticalFlip(rng),
        "random_affine": lambda: RandomAffine(rng),
        "random_rotation": lambda: RandomRotation(rng),
        "random_resize": lambda: RandomResize(rng),
        "random_elastic": lambda: RandomElastic(rng),
        "random_crop": lambda: RandomCrop(rng, input_size),
        "to_tensor": lambda: ToArrays(),
        "normalize": lambda: Normalize(mean, std),
    }
    ts = [table[n]() for n in names if n in table]
    return Compose(ts)
