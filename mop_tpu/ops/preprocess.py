"""On-device input preprocessing — XLA-compiled augmentation ops.

The reference does augmentation on host CPU via torchvision transforms
(RandomCrop/flip: ``experiments/cifar100_ab5_param_budgets.py:129-135``;
RandAugment/RandomErasing/Mixup/CutMix: ``imagenet_ab_param_budgets.py:103-117,
447-479``). Here every op is a pure jittable function over uint8/float batches
so the input pipeline runs on-device, off the host critical path — one of the
BASELINE.json performance requirements.

All image batches are NCHW float32 (matching the model input convention);
internally ops are vectorized over the batch with vmap-free gather logic.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp

Array = jax.Array

CIFAR10_MEAN = (0.4914, 0.4822, 0.4465)
CIFAR10_STD = (0.2470, 0.2435, 0.2616)
CIFAR100_MEAN = (0.5071, 0.4865, 0.4409)
CIFAR100_STD = (0.2673, 0.2564, 0.2762)
IMAGENET_MEAN = (0.485, 0.456, 0.406)
IMAGENET_STD = (0.229, 0.224, 0.225)


def normalize(x: Array, mean, std) -> Array:
    """(B,C,H,W) in [0,1] -> normalized."""
    mean = jnp.asarray(mean, x.dtype).reshape(1, -1, 1, 1)
    std = jnp.asarray(std, x.dtype).reshape(1, -1, 1, 1)
    return (x - mean) / std


def to_float(x: Array) -> Array:
    """uint8 [0,255] -> float32 [0,1]."""
    return x.astype(jnp.float32) / 255.0


def random_crop(key: Array, x: Array, padding: int = 4) -> Array:
    """Pad-and-crop (torchvision RandomCrop(size, padding) equivalent).

    Per-sample random offsets; static shapes via dynamic_slice over the padded
    image, vectorized with gather indexing.
    """
    b, c, h, w = x.shape
    xp = jnp.pad(x, ((0, 0), (0, 0), (padding, padding), (padding, padding)))
    kh, kw = jax.random.split(key)
    off_h = jax.random.randint(kh, (b,), 0, 2 * padding + 1)
    off_w = jax.random.randint(kw, (b,), 0, 2 * padding + 1)
    rows = off_h[:, None] + jnp.arange(h)[None, :]  # (B, H)
    cols = off_w[:, None] + jnp.arange(w)[None, :]  # (B, W)
    # Two single-axis gathers (take_along_axis) — a combined 4-axis fancy
    # index lowers to an enormous gather that dominates the train step on TPU.
    out = jnp.take_along_axis(xp, rows[:, None, :, None], axis=2)
    out = jnp.take_along_axis(out, cols[:, None, None, :], axis=3)
    return out


def random_hflip(key: Array, x: Array, p: float = 0.5) -> Array:
    """Per-sample horizontal flip."""
    b = x.shape[0]
    flip = jax.random.bernoulli(key, p, (b, 1, 1, 1))
    return jnp.where(flip, x[..., ::-1], x)


def random_erasing(
    key: Array,
    x: Array,
    p: float = 0.25,
    scale: Tuple[float, float] = (0.02, 0.33),
    ratio: Tuple[float, float] = (0.3, 3.3),
) -> Array:
    """RandomErasing (reference ``imagenet_ab_param_budgets.py:114-117``):
    zero a random rectangle per sample with probability p. Static-shape mask
    construction (no dynamic shapes)."""
    b, c, h, w = x.shape
    k1, k2, k3, k4, k5 = jax.random.split(key, 5)
    area = h * w
    target = jax.random.uniform(k1, (b,), minval=scale[0], maxval=scale[1]) * area
    log_ratio = jax.random.uniform(
        k2, (b,), minval=jnp.log(ratio[0]), maxval=jnp.log(ratio[1])
    )
    aspect = jnp.exp(log_ratio)
    eh = jnp.clip(jnp.sqrt(target * aspect).astype(jnp.int32), 1, h)
    ew = jnp.clip(jnp.sqrt(target / aspect).astype(jnp.int32), 1, w)
    top = (jax.random.uniform(k3, (b,)) * (h - eh + 1)).astype(jnp.int32)
    left = (jax.random.uniform(k4, (b,)) * (w - ew + 1)).astype(jnp.int32)
    rows = jnp.arange(h)[None, :]
    cols = jnp.arange(w)[None, :]
    row_in = (rows >= top[:, None]) & (rows < (top + eh)[:, None])  # (B,H)
    col_in = (cols >= left[:, None]) & (cols < (left + ew)[:, None])  # (B,W)
    box = row_in[:, None, :, None] & col_in[:, None, None, :]  # (B,1,H,W)
    apply = jax.random.bernoulli(k5, p, (b, 1, 1, 1))
    return jnp.where(apply & box, 0.0, x)


def mixup(key: Array, x: Array, y_onehot: Array, alpha: float = 0.2):
    """Mixup (reference ``imagenet_ab_param_budgets.py:460-467``):
    lam ~ Beta(alpha, alpha); mixes the batch with a flipped copy."""
    k1, _ = jax.random.split(key)
    lam = jax.random.beta(k1, alpha, alpha)
    perm_x = x[::-1]
    perm_y = y_onehot[::-1]
    return lam * x + (1.0 - lam) * perm_x, lam * y_onehot + (1.0 - lam) * perm_y


def cutmix(key: Array, x: Array, y_onehot: Array, alpha: float = 1.0):
    """CutMix (reference :469-479 with ``rand_bbox`` :447-458): paste a random
    box from the flipped batch; label weight = box area fraction."""
    b, c, h, w = x.shape
    k1, k2, k3 = jax.random.split(key, 3)
    lam = jax.random.beta(k1, alpha, alpha)
    cut_rat = jnp.sqrt(1.0 - lam)
    cut_h = (h * cut_rat).astype(jnp.int32)
    cut_w = (w * cut_rat).astype(jnp.int32)
    cy = jax.random.randint(k2, (), 0, h)
    cx = jax.random.randint(k3, (), 0, w)
    y1 = jnp.clip(cy - cut_h // 2, 0, h)
    y2 = jnp.clip(cy + cut_h // 2, 0, h)
    x1 = jnp.clip(cx - cut_w // 2, 0, w)
    x2 = jnp.clip(cx + cut_w // 2, 0, w)
    rows = jnp.arange(h)
    cols = jnp.arange(w)
    box = ((rows >= y1) & (rows < y2))[:, None] & ((cols >= x1) & (cols < x2))[None, :]
    mixed = jnp.where(box[None, None], x[::-1], x)
    lam_adj = 1.0 - ((y2 - y1) * (x2 - x1)) / (h * w)
    return mixed, lam_adj * y_onehot + (1.0 - lam_adj) * y_onehot[::-1]


def _adjust_brightness(x, mag):
    return jnp.clip(x * (1.0 + mag), 0.0, 1.0)


def _adjust_contrast(x, mag):
    mean = jnp.mean(x, axis=(-3, -2, -1), keepdims=True)
    return jnp.clip((x - mean) * (1.0 + mag) + mean, 0.0, 1.0)


def _adjust_saturation(x, mag):
    gray = jnp.mean(x, axis=-3, keepdims=True)
    return jnp.clip(gray + (x - gray) * (1.0 + mag), 0.0, 1.0)


def _posterize(x, mag):
    bits = jnp.clip(8.0 - jnp.abs(mag) * 6.0, 2.0, 8.0)
    levels = 2.0 ** bits
    return jnp.floor(x * levels) / levels


def _solarize(x, mag):
    thresh = jnp.clip(1.0 - jnp.abs(mag), 0.1, 1.0)
    return jnp.where(x >= thresh, 1.0 - x, x)


def _invert(x, mag):
    return 1.0 - x


def _translate_x(x, mag):
    shift = (mag * x.shape[-1] * 0.3).astype(jnp.int32)
    return jnp.roll(x, shift, axis=-1)


def _translate_y(x, mag):
    shift = (mag * x.shape[-2] * 0.3).astype(jnp.int32)
    return jnp.roll(x, shift, axis=-2)


_RANDAUG_OPS = (
    _adjust_brightness,
    _adjust_contrast,
    _adjust_saturation,
    _posterize,
    _solarize,
    _invert,
    _translate_x,
    _translate_y,
)


def rand_augment(key: Array, x: Array, n: int = 2, m: int = 9) -> Array:
    """RandAugment-style policy, fully on-device (reference uses torchvision's
    host-side RandAugment, ``imagenet_ab_param_budgets.py:103-107``).

    Applies ``n`` randomly-chosen ops per sample at magnitude ``m``/30 with
    random sign. The op set is the photometric/translation subset that maps
    cleanly onto XLA (no image warps); semantically equivalent regularization.
    x: (B,C,H,W) float in [0,1].
    """
    mag = m / 30.0

    def apply_one(key, img):
        def body(i, carry):
            img, k = carry
            k, k_op, k_sign = jax.random.split(k, 3)
            op_idx = jax.random.randint(k_op, (), 0, len(_RANDAUG_OPS))
            sign = jnp.where(jax.random.bernoulli(k_sign), 1.0, -1.0)
            img = jax.lax.switch(
                op_idx, [lambda im, s=s: _RANDAUG_OPS[s](im, sign * mag)
                         for s in range(len(_RANDAUG_OPS))], img)
            return img, k

        img, _ = jax.lax.fori_loop(0, n, body, (img, key))
        return img

    keys = jax.random.split(key, x.shape[0])
    return jax.vmap(apply_one)(keys, x)


def cifar_train_augment(key: Array, x_uint8: Array, mean, std) -> Array:
    """The reference CIFAR train transform: RandomCrop(32, pad 4) + flip +
    normalize (``cifar100_ab5_param_budgets.py:129-135``), fully on-device."""
    k1, k2 = jax.random.split(key)
    x = to_float(x_uint8)
    x = random_crop(k1, x, padding=4)
    x = random_hflip(k2, x)
    return normalize(x, mean, std)


def cifar_eval_transform(x_uint8: Array, mean, std) -> Array:
    return normalize(to_float(x_uint8), mean, std)


def label_smoothing_onehot(y: Array, n_classes: int, smoothing: float = 0.0) -> Array:
    """One-hot with label smoothing (reference ``imagenet...:652-654``)."""
    off = smoothing / n_classes
    on = 1.0 - smoothing + off
    return jax.nn.one_hot(y, n_classes) * (on - off) + off
