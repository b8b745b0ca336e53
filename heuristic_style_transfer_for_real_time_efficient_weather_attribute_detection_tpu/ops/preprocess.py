"""Image preprocessing — host decode/resize, device normalize.

Host side reproduces the reference transform exactly
(utils/datasets_utils.py:205-215: Resize(256, bilinear) -> CenterCrop(224) ->
ToTensor -> ImageNet Normalize) using PIL directly, so outputs are
bit-identical to torchvision on PIL inputs.

Device side: images cross host->device as **uint8** (4x less H2D traffic than
f32 — the usual serving bottleneck) and are converted+normalized on the TPU
inside the jitted forward (``normalize_uint8``).
"""

from __future__ import annotations

from typing import Tuple

import jax.numpy as jnp
import numpy as np
from PIL import Image

from ..config import DEFAULT_IMG_SIZE, DEFAULT_RESIZE, IMAGENET_MEAN, IMAGENET_STD

VALID_EXTS = {".jpg", ".jpeg", ".png", ".bmp"}
_IMAGE_SUFFIXES = tuple(sorted(VALID_EXTS))


def is_image_name(fn: str) -> bool:
    """Name-SUFFIX image filter, matching the reference pipelines that use
    ``fn.lower().endswith((...))`` (benchmark_utils.py:47,
    PM_evaluation.py:695, RTM_evaluation.py:789): unlike a splitext check,
    a dotfile named exactly ".jpg" counts as an image.  The reference's
    ``collect_image_paths`` (datasets_utils.py:77-87) is the splitext
    variant — keep using VALID_EXTS there."""
    return fn.lower().endswith(_IMAGE_SUFFIXES)


def resize_shorter(img: Image.Image, size: int = DEFAULT_RESIZE) -> Image.Image:
    """Resize so the shorter side equals ``size`` (aspect preserved, bilinear).

    Same arithmetic as torchvision ``Resize(int)`` on PIL images.
    """
    w, h = img.size
    if (w <= h and w == size) or (h <= w and h == size):
        return img
    if w < h:
        new_w = size
        new_h = int(round(size * h / w))
    else:
        new_h = size
        new_w = int(round(size * w / h))
    return img.resize((new_w, new_h), Image.BILINEAR)


def center_crop(img: Image.Image, size: int = DEFAULT_IMG_SIZE) -> Image.Image:
    """Center crop (torchvision ``CenterCrop`` rounding)."""
    w, h = img.size
    left = int(round((w - size) / 2.0))
    top = int(round((h - size) / 2.0))
    return img.crop((left, top, left + size, top + size))


def load_image_uint8(
    path_or_img, img_size: int = DEFAULT_IMG_SIZE, resize: int = DEFAULT_RESIZE
) -> np.ndarray:
    """Decode + resize + crop -> HWC uint8 (normalization happens on device)."""
    img = (
        path_or_img
        if isinstance(path_or_img, Image.Image)
        else Image.open(path_or_img)
    )
    img = img.convert("RGB")
    img = center_crop(resize_shorter(img, resize), img_size)
    return np.asarray(img, dtype=np.uint8)


def load_image_normalized(path_or_img, img_size: int = DEFAULT_IMG_SIZE) -> np.ndarray:
    """Full reference transform on host -> HWC float32 (parity/debug path)."""
    arr = load_image_uint8(path_or_img, img_size).astype(np.float32) / 255.0
    mean = np.asarray(IMAGENET_MEAN, np.float32)
    std = np.asarray(IMAGENET_STD, np.float32)
    return (arr - mean) / std


def normalize_uint8(
    x: jnp.ndarray, dtype: jnp.dtype = jnp.float32
) -> jnp.ndarray:
    """uint8 NHWC [0,255] -> normalized float NHWC, on device.

    Folds /255 into the per-channel affine so it is a single fused
    multiply-add: ``x * (1/(255*std)) - mean/std``.
    """
    scale = (1.0 / (255.0 * np.asarray(IMAGENET_STD, np.float32))).astype(np.float32)
    shift = (
        np.asarray(IMAGENET_MEAN, np.float32) / np.asarray(IMAGENET_STD, np.float32)
    ).astype(np.float32)
    return (x.astype(dtype) * jnp.asarray(scale, dtype) - jnp.asarray(shift, dtype))


_HOST_SCALE = (1.0 / (255.0 * np.asarray(IMAGENET_STD, np.float32))).astype(np.float32)
_HOST_SHIFT = (
    np.asarray(IMAGENET_MEAN, np.float32) / np.asarray(IMAGENET_STD, np.float32)
).astype(np.float32)


def normalize_uint8_host(x: np.ndarray) -> np.ndarray:
    """Host-side (numpy) twin of ``normalize_uint8`` — same folded affine,
    for callers feeding pre-normalized floats to a jitted step."""
    return x.astype(np.float32) * _HOST_SCALE - _HOST_SHIFT


def denormalize(x: jnp.ndarray) -> jnp.ndarray:
    """Normalized float NHWC -> [0,1] float NHWC (for overlays/exports)."""
    mean = jnp.asarray(IMAGENET_MEAN, x.dtype)
    std = jnp.asarray(IMAGENET_STD, x.dtype)
    return jnp.clip(x * std + mean, 0.0, 1.0)


def normalize01(x: jnp.ndarray) -> jnp.ndarray:
    """[0,1] float NHWC -> ImageNet-normalized (style-transfer pixel path)."""
    mean = jnp.asarray(IMAGENET_MEAN, x.dtype)
    std = jnp.asarray(IMAGENET_STD, x.dtype)
    return (x - mean) / std


def s2d_pack_uint8(u8: np.ndarray, k: int) -> np.ndarray:
    """Host-side space-to-depth pack: uint8 NHWC -> [B, H/k, W/k, k*k*C].

    The packed layout is the framework's PMG wire format: a non-overlapping
    conv (kernel == stride == k, pad 0) over the original image is exactly a
    GEMM on the packed channel axis, which XLA runs far faster than its conv
    lowering at every batch size we measured (2.8x at batch=1, 1.6x at 512).
    Uses the native C kernel (native/s2d_pack.c, ~8 us per 224px frame) when
    the compiler is available, numpy otherwise (~90 us).  Pair with
    ``normalize_uint8_packed``.
    """
    from ..native import s2d_pack_fn

    b, h, w, c = u8.shape
    hp, wp = h // k, w // k
    fn = s2d_pack_fn()
    if fn is not None:
        u8 = np.ascontiguousarray(u8)
        out = np.empty((b, hp, wp, k * k * c), np.uint8)
        fn(u8.ctypes.data, out.ctypes.data, b, h, w, c, k)
        return out
    # crop any remainder rows/cols, matching both the C kernel and the
    # pad-0 stride-k conv this layout replaces
    u8 = u8[:, : hp * k, : wp * k]
    return np.ascontiguousarray(
        u8.reshape(b, hp, k, wp, k, c)
        .transpose(0, 1, 3, 2, 4, 5)
        .reshape(b, hp, wp, k * k * c)
    )


def packed_affine(k: int) -> Tuple[np.ndarray, np.ndarray]:
    """(scale, shift) of the uint8 normalize affine ``x*scale - shift``,
    tiled ``k*k`` times to match the ``s2d_pack_uint8`` channel order.

    The single owner of the packed-affine layout: used by
    ``normalize_uint8_packed`` and by stem-GEMM folds that bake the affine
    into weights (models/pmg.apply_packed, tools/exp_pmg_normfold.py)."""
    return np.tile(_HOST_SCALE, k * k), np.tile(_HOST_SHIFT, k * k)


def normalize_uint8_packed(
    z8: jnp.ndarray, k: int, dtype: jnp.dtype = jnp.float32
) -> jnp.ndarray:
    """Device normalize for ``s2d_pack_uint8`` output: the per-RGB affine
    tiled k*k times over the packed channel axis."""
    scale, shift = packed_affine(k)
    return z8.astype(dtype) * jnp.asarray(scale, dtype) - jnp.asarray(shift, dtype)


def s2d_unpack_uint8(z8: np.ndarray, k: int) -> np.ndarray:
    """Inverse of ``s2d_pack_uint8``: [B, Hp, Wp, k*k*C] -> uint8 NHWC.

    Host-side, for consumers that need the original pixels back from a
    packed batch (e.g. annotated eval-image dumps).
    """
    b, hp, wp, cc = z8.shape
    c = cc // (k * k)
    return np.ascontiguousarray(
        z8.reshape(b, hp, wp, k, k, c)
        .transpose(0, 1, 3, 2, 4, 5)
        .reshape(b, hp * k, wp * k, c)
    )
