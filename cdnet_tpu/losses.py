"""Loss library (numerics parity with `/root/reference/loss.py` and the
composite assembled in `train_util_dam.py:167-276` — SURVEY.md §3.2).

All losses are pure functions over NHWC float32 logits/probabilities, designed
to sit inside one jit-compiled train step (no host sync). Class axes are last
(channels-last), unlike the reference's NCHW.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def weighted_nll(logits: jnp.ndarray, target: jnp.ndarray,
                 weight_map: jnp.ndarray | None = None) -> jnp.ndarray:
    """mean( NLL(log_softmax(logits), target) * weight_map ).

    Reference: criterion = NLLLoss(reduction='none') on log_softmax
    (train.py:92, train_util_dam.py:165-172). ``target``: (N,H,W) int.
    """
    logp = jax.nn.log_softmax(logits, axis=-1)
    nll = -jnp.take_along_axis(logp, target[..., None].astype(jnp.int32),
                               axis=-1)[..., 0]
    if weight_map is not None:
        nll = nll * weight_map
    return jnp.mean(nll)


def dice_loss(probs: jnp.ndarray, target: jnp.ndarray, smooth: float = 1.0) -> jnp.ndarray:
    """Single-channel dice loss (loss.py:131-147). Inputs (N, ...) flattened per sample."""
    n = probs.shape[0]
    p = probs.reshape(n, -1)
    t = target.reshape(n, -1)
    inter = jnp.sum(p * t, axis=1)
    dice = 2.0 * (inter + smooth) / (jnp.sum(p, axis=1) + jnp.sum(t, axis=1) + smooth)
    return 1.0 - jnp.sum(dice) / n


def multiclass_dice_loss(probs: jnp.ndarray, onehot: jnp.ndarray) -> jnp.ndarray:
    """Sum of per-class dice losses (loss.py:150-176). Channels last."""
    c = onehot.shape[-1]
    total = 0.0
    for i in range(c):
        total = total + dice_loss(probs[..., i], onehot[..., i])
    return total


def weight_dice_loss(probs: jnp.ndarray, target: jnp.ndarray,
                     weights: jnp.ndarray, smooth: float = 1.0) -> jnp.ndarray:
    """Pixel-weighted dice (loss.py:181-199)."""
    n = probs.shape[0]
    p = probs.reshape(n, -1)
    t = target.reshape(n, -1)
    w = weights.reshape(n, -1)
    inter = jnp.sum(p * t * w, axis=1)
    dice = 2.0 * (inter + smooth) / (
        jnp.sum(p * w, axis=1) + jnp.sum(t * w, axis=1) + smooth)
    return 1.0 - jnp.sum(dice) / n


def weight_multiclass_dice_loss(probs: jnp.ndarray, onehot: jnp.ndarray,
                                weights: jnp.ndarray) -> jnp.ndarray:
    """Weighted multiclass dice with +-neighbor-class repulsion (loss.py:202-260).

    Class 0 (background): 2x its weighted dice loss. Class i>=1: its weighted
    dice loss minus the dice *similarity* against the previous and next
    direction class (cyclic over 1..C-1) — pushing probability mass away from
    angularly adjacent classes.
    """
    c = onehot.shape[-1]
    total = 0.0
    for i in range(c):
        if i == 0:
            total = total + 2.0 * weight_dice_loss(probs[..., 0], onehot[..., 0], weights)
            continue
        prev = c - 1 if i == 1 else i - 1
        nxt = 1 if i == c - 1 else i + 1
        li = weight_dice_loss(probs[..., i], onehot[..., i], weights)
        sim_prev = 1.0 - weight_dice_loss(probs[..., i], onehot[..., prev], weights)
        sim_next = 1.0 - weight_dice_loss(probs[..., i], onehot[..., nxt], weights)
        total = total + (li - sim_prev - sim_next)
    return total / c


def focal_loss(logits: jnp.ndarray, onehot: jnp.ndarray, gamma: float = 2.0,
               robust: bool = False) -> jnp.ndarray:
    """Sigmoid focal loss — the reference's criterion_FocalLoss2d default
    (loss.py:36-77, type='sigmoid' as constructed in train_util_dam.py:31):
    every (pixel, class) logit is scored as an independent BINARY problem
    against its one-hot entry, pt = sigmoid(x) if target else 1-sigmoid(x),
    mean of -(1-pt)^gamma log(pt) over N*C*H*W elements. The robust variant
    (loss.py:80-126) clamps the focus term to [0, 2] (a no-op at gamma=2
    since (1-pt)^2 <= 1, kept for parity)."""
    p = jax.nn.sigmoid(logits)
    p_t = jnp.where(onehot > 0.5, p, 1.0 - p)
    p_t = jnp.clip(p_t, 1e-8, 1 - 1e-8)
    focus = (1.0 - p_t) ** gamma
    if robust:
        focus = jnp.clip(focus, 0.0, 2.0)
    return jnp.mean(-focus * jnp.log(p_t))


def boundary_loss(logits: jnp.ndarray, onehot: jnp.ndarray,
                  theta0: int = 3, theta: int = 5) -> jnp.ndarray:
    """Boundary-F1 loss (loss.py:331-393): boundary maps via max-pool of the
    complement, extended bands, precision/recall/BF1 per class."""
    def maxpool(x, k):
        return jax.lax.reduce_window(
            x, -jnp.inf, jax.lax.max, (1, k, k, 1), (1, 1, 1, 1),
            [(0, 0), ((k - 1) // 2, (k - 1) // 2),
             ((k - 1) // 2, (k - 1) // 2), (0, 0)])

    pred = jax.nn.softmax(logits, axis=-1)
    gt_b = maxpool(1.0 - onehot, theta0) - (1.0 - onehot)
    pred_b = maxpool(1.0 - pred, theta0) - (1.0 - pred)
    gt_b_ext = maxpool(gt_b, theta)
    pred_b_ext = maxpool(pred_b, theta)
    n, c = logits.shape[0], logits.shape[-1]
    gt_b = gt_b.reshape(n, -1, c)
    pred_b = pred_b.reshape(n, -1, c)
    gt_b_ext = gt_b_ext.reshape(n, -1, c)
    pred_b_ext = pred_b_ext.reshape(n, -1, c)
    p = jnp.sum(pred_b * gt_b_ext, axis=1) / (jnp.sum(pred_b, axis=1) + 1e-7)
    r = jnp.sum(pred_b_ext * gt_b, axis=1) / (jnp.sum(gt_b, axis=1) + 1e-7)
    bf1 = 2 * p * r / (p + r + 1e-7)
    return jnp.mean(1.0 - bf1)


def variance_loss(probs: jnp.ndarray, instance_labels: jnp.ndarray,
                  max_instances: int) -> jnp.ndarray:
    """Per-instance probability variance (LossVariance, loss.py:9-33).

    For each sample: sum over instances of sum_c Var(probs[c] within instance)
    (unbiased, instances of size <= 1 contribute 0), divided by the instance
    count. ``instance_labels``: (N,H,W) int with 0 background.

    ``max_instances`` is a hard scatter bound: ids above it fall off the
    bucket table (JAX drops out-of-bounds scatters) and contribute nothing —
    unlike label synthesis there is no chunked rescue here, so size the
    bound to the densest expected tile (the train driver's default 160
    covers ~3x the reference's MoNuSeg crops).
    """
    n, c = probs.shape[0], probs.shape[-1]
    k = max_instances + 1

    def per_sample(p, lab):
        flat_l = lab.reshape(-1)
        flat_p = p.reshape(-1, c)
        cnt = jnp.zeros(k, flat_p.dtype).at[flat_l].add(1.0)
        s1 = jnp.zeros((k, c), flat_p.dtype).at[flat_l].add(flat_p)
        s2 = jnp.zeros((k, c), flat_p.dtype).at[flat_l].add(flat_p ** 2)
        cnt_ = jnp.maximum(cnt, 1.0)[:, None]
        var = (s2 - s1 ** 2 / cnt_) / jnp.maximum(cnt[:, None] - 1.0, 1.0)
        valid = (cnt > 1.0)[:, None]
        var = jnp.where(valid, var, 0.0)
        var = var.at[0].set(0.0)  # background excluded
        n_inst = jnp.sum(cnt[1:] > 0)
        return jnp.sum(var[1:]) / (n_inst + 1e-8)

    return jnp.mean(jax.vmap(per_sample)(probs, instance_labels))


def center_loss(features: jnp.ndarray, labels: jnp.ndarray,
                centers: jnp.ndarray) -> jnp.ndarray:
    """Center loss (Wen et al. ECCV'16; reference loss.py:266-315).

    ``features`` (B, D), ``labels`` (B,) int, ``centers`` (C, D) — a
    learnable parameter the caller owns (the reference stores it as an
    nn.Parameter). Squared distance of each feature to its class center.
    Faithful quirk kept: the reference clamps AFTER masking, so every
    off-class cell contributes the 1e-12 clamp floor to the sum."""
    sq = (jnp.sum(features ** 2, axis=1, keepdims=True)
          + jnp.sum(centers ** 2, axis=1)[None, :]
          - 2.0 * features @ centers.T)
    mask = labels[:, None] == jnp.arange(centers.shape[0])[None, :]
    dist = jnp.clip(sq * mask, 1e-12, 1e12)
    return jnp.sum(dist) / features.shape[0]


def mse_loss(pred: jnp.ndarray, target: jnp.ndarray) -> jnp.ndarray:
    return jnp.mean((pred - target) ** 2)


def _ssim_window(window_size: int = 11, sigma: float = 1.5) -> jnp.ndarray:
    x = jnp.arange(window_size, dtype=jnp.float32) - window_size // 2
    g = jnp.exp(-(x ** 2) / (2.0 * sigma ** 2))
    g = g / jnp.sum(g)
    return jnp.outer(g, g)


def ssim(img1: jnp.ndarray, img2: jnp.ndarray, window_size: int = 11) -> jnp.ndarray:
    """Structural similarity (hhl_utils/pytorch_ssim.py parity: 11x11 gaussian
    window sigma 1.5, per-channel depthwise conv, C1/C2 for dynamic range 1).

    Inputs (N, H, W, C) in [0, 1]; returns the mean SSIM index.
    """
    w = _ssim_window(window_size)
    c = img1.shape[-1]
    kern = jnp.tile(w[:, :, None, None], (1, 1, 1, c))  # HWIO depthwise

    def dconv(x):
        return jax.lax.conv_general_dilated(
            x, kern, (1, 1),
            [(window_size // 2, window_size // 2)] * 2,
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            feature_group_count=c)

    mu1, mu2 = dconv(img1), dconv(img2)
    mu1_sq, mu2_sq, mu12 = mu1 ** 2, mu2 ** 2, mu1 * mu2
    s1 = dconv(img1 * img1) - mu1_sq
    s2 = dconv(img2 * img2) - mu2_sq
    s12 = dconv(img1 * img2) - mu12
    c1, c2 = 0.01 ** 2, 0.03 ** 2
    ssim_map = ((2 * mu12 + c1) * (2 * s12 + c2)) / (
        (mu1_sq + mu2_sq + c1) * (s1 + s2 + c2))
    return jnp.mean(ssim_map)


def ssim_loss(img1: jnp.ndarray, img2: jnp.ndarray) -> jnp.ndarray:
    """1 - SSIM (the optional SSIM path in train_util.py)."""
    return 1.0 - ssim(img1, img2)


def composite_loss(outputs: dict, targets: dict, cfg,
                   max_instances: int = 160) -> tuple[jnp.ndarray, dict]:
    """The CDNet training loss (SURVEY.md §3.2; train_util_dam.py:167-276).

    outputs: {"mask": (N,H,W,3) logits, "point": (N,H,W,1), "direction": (N,H,W,C)}
    targets: {"mask": (N,H,W) int, "mask_onehot": (N,H,W,3),
              "weight": (N,H,W) (already /20), "point": (N,H,W,1),
              "direction": (N,H,W) int, "direction_onehot": (N,H,W,C)}
    Returns (total, dict of components).

    Composition order is the reference's EXACTLY: CE -> alpha/variance
    (alpha==2 REPLACES the CE with 2*loss_var but everything after still
    adds, train_util_dam.py:182-189) -> boundary -> dice (dice==2 replaces
    the running loss, :217-219) -> direction CE (+ direction dice if
    dice==1) -> point MSE. The variance target is the 8-connected CC
    labeling of the INTERIOR class (measure.label(target == 1), :178-180)
    computed on device — not the watershed-resplit supervision instances.
    """
    m = cfg.model
    comps = {}
    w = targets["weight"] if m.add_weight_map else None

    loss = weighted_nll(outputs["mask"], targets["mask"], w)
    comps["loss_CE"] = loss

    alpha = getattr(cfg.train, "alpha", 0)
    if alpha in (1, 2):
        from cdnet_tpu.ops.connected import label as cc_label
        from cdnet_tpu.ops.pallas_gate import scoped_disable
        probs = jax.nn.softmax(outputs["mask"], axis=-1)
        # batched XLA CC: the pallas fixpoint would serialize under vmap
        # and cannot partition in a sharded train program
        with scoped_disable(True):
            inst = jax.vmap(
                lambda t: cc_label(t == 1, connectivity=2)[0]
            )(targets["mask"])
        lv = variance_loss(probs, inst, max_instances)
        loss = loss + alpha * lv if alpha == 1 else alpha * lv
        comps["loss_var"] = lv

    if m.boundary_loss == 1:
        b = boundary_loss(outputs["mask"], targets["mask_onehot"])
        loss = loss + b
        comps["loss_boundary"] = b
    elif m.boundary_loss == 2:
        b = focal_loss(outputs["mask"], targets["mask_onehot"])
        loss = loss + b
        comps["loss_boundary"] = b
    elif m.boundary_loss == 3:
        b = focal_loss(outputs["mask"], targets["mask_onehot"], robust=True)
        loss = loss + b
        comps["loss_boundary"] = b

    if m.dice == 1:
        probs = jax.nn.softmax(outputs["mask"], axis=-1)
        d = multiclass_dice_loss(probs, targets["mask_onehot"])
        loss = loss + d
        comps["loss_dice"] = d
    elif m.dice == 2:
        probs = jax.nn.softmax(outputs["mask"], axis=-1)
        loss = multiclass_dice_loss(probs, targets["mask_onehot"])
        comps["loss_dice"] = loss

    if m.direction == 1 and "direction" in outputs:
        dce = weighted_nll(outputs["direction"], targets["direction"], w)
        loss = loss + dce
        comps["loss_direction_CE"] = dce
        if m.dice == 1:
            dprobs = jax.nn.softmax(outputs["direction"], axis=-1)
            if m.add_weight_map:
                dd = weight_multiclass_dice_loss(
                    dprobs, targets["direction_onehot"], targets["weight"])
            else:
                dd = multiclass_dice_loss(dprobs, targets["direction_onehot"])
            loss = loss + dd
            comps["loss_direction_dice"] = dd

    if m.mseloss == 1 and "point" in outputs:
        pm = mse_loss(outputs["point"], targets["point"])
        loss = loss + pm
        comps["loss_mse"] = pm

    comps["loss"] = loss
    return loss, comps
