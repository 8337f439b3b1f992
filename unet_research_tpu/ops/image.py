"""Image geometry ops with PyTorch-parity numerics, NHWC layout.

The reference pipeline leans on torchvision functional ops (bilinear resize
without antialias, bilinear rotation with zero fill, center crop, square pad —
see reference uncertainty_tests/Rotational_Uncertainty.py:51-59 and
utils/utils_general.py:32-43). Output fidelity is gated on matching those
numerics, so each op here reproduces the torch half-pixel sampling convention
exactly; parity is enforced by tests/test_image_ops.py against torch CPU.

All ops are jit-/vmap-friendly: static shapes, traced scalars allowed for
angles, no Python branching on traced values.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def resize_bilinear(img: jax.Array, size: tuple[int, int]) -> jax.Array:
    """Bilinear resize of NHWC (or HWC) images to `size` = (H, W).

    Matches ``torch.nn.functional.interpolate(mode='bilinear',
    align_corners=False, antialias=False)``, which is what
    ``torchvision.transforms.functional.resize`` does on tensors in the
    reference (e.g. multi-fidelity/MF-training-UNI.py:66-74).

    jax.image.resize with ``antialias=False`` uses the same half-pixel source
    mapping ``src = (dst + 0.5) * scale - 0.5`` with a triangle kernel, i.e.
    identical numerics.
    """
    h, w = int(size[0]), int(size[1])
    if img.ndim == 4:
        out_shape = (img.shape[0], h, w, img.shape[3])
    elif img.ndim == 3:
        out_shape = (h, w, img.shape[2])
    else:
        raise ValueError(f"expected HWC or NHWC, got shape {img.shape}")
    return jax.image.resize(img, out_shape, method="linear", antialias=False)


def _bilinear_gather_2d(img: jax.Array, src_y: jax.Array, src_x: jax.Array) -> jax.Array:
    """Sample NHWC `img` at fractional (src_y, src_x) maps of shape (H', W').

    Zero padding outside the image, matching ``torch.nn.functional.grid_sample
    (padding_mode='zeros', align_corners=False)``: each of the four corner
    taps contributes 0 when it falls outside the canvas.
    """
    n, h, w, c = img.shape
    y0 = jnp.floor(src_y)
    x0 = jnp.floor(src_x)
    wy = (src_y - y0)[None, :, :, None]
    wx = (src_x - x0)[None, :, :, None]
    y0 = y0.astype(jnp.int32)
    x0 = x0.astype(jnp.int32)

    def tap(yi, xi):
        valid = (yi >= 0) & (yi < h) & (xi >= 0) & (xi < w)
        yc = jnp.clip(yi, 0, h - 1)
        xc = jnp.clip(xi, 0, w - 1)
        # gather rows then columns: (N, H', W', C)
        vals = img[:, yc, xc, :]
        return vals * valid[None, :, :, None].astype(img.dtype)

    v00 = tap(y0, x0)
    v01 = tap(y0, x0 + 1)
    v10 = tap(y0 + 1, x0)
    v11 = tap(y0 + 1, x0 + 1)
    top = v00 * (1.0 - wx) + v01 * wx
    bot = v10 * (1.0 - wx) + v11 * wx
    return top * (1.0 - wy) + bot * wy


def rotate_bilinear(img: jax.Array, angle_deg: jax.Array | float) -> jax.Array:
    """Rotate NHWC images by `angle_deg` counter-clockwise about the center.

    Matches ``torchvision.transforms.functional.rotate(interpolation=BILINEAR,
    expand=False, fill=0, center=None)`` as used by the rotational-uncertainty
    engine (reference uncertainty_tests/Rotational_Uncertainty.py:54-58):
    rotation about the pixel-center image center ((W-1)/2, (H-1)/2), bilinear
    sampling, zeros outside.

    `angle_deg` may be a traced scalar, so a whole fan of angles can be
    evaluated as one vmapped batch on device.
    """
    n, h, w, c = img.shape
    a = jnp.deg2rad(jnp.asarray(angle_deg, dtype=jnp.float32))
    cy = (h - 1) / 2.0
    cx = (w - 1) / 2.0
    yy = jnp.arange(h, dtype=jnp.float32)[:, None] - cy  # (H, 1)
    xx = jnp.arange(w, dtype=jnp.float32)[None, :] - cx  # (1, W)
    cos_a = jnp.cos(a)
    sin_a = jnp.sin(a)
    # Inverse map of a CCW rotation in image coords (y axis points down):
    # torchvision composes the same matrix via _get_inverse_affine_matrix.
    src_x = cos_a * xx - sin_a * yy + cx
    src_y = sin_a * xx + cos_a * yy + cy
    src_x = jnp.broadcast_to(src_x, (h, w))
    src_y = jnp.broadcast_to(src_y, (h, w))
    return _bilinear_gather_2d(img, src_y, src_x)


def square_pad(img: jax.Array) -> jax.Array:
    """Zero-pad NHWC images to a max(H, W) square.

    Reproduces the reference's exact (slightly asymmetric) split
    (utils/utils_general.py:32-43): height gives the extra pixel to the
    bottom, width gives it to the *left*.
    """
    h, w = img.shape[-3], img.shape[-2]
    size = max(h, w)
    total_h = size - h
    top = total_h // 2
    bot = total_h - top
    total_w = size - w
    right = total_w // 2
    left = total_w - right
    pad = [(0, 0)] * (img.ndim - 3) + [(top, bot), (left, right), (0, 0)]
    return jnp.pad(img, pad)


def pad_to_multiple(img: jax.Array, multiple: int) -> tuple[jax.Array, tuple[int, int]]:
    """Zero-pad NHWC bottom/right so H and W are multiples of `multiple`.

    The model-input autopad (reference utils/utils_unet.py:451-458). Returns
    the padded image and the original (H, W) for `crop_to`.
    """
    h, w = img.shape[-3], img.shape[-2]
    ph = -h % multiple
    pw = -w % multiple
    pad = [(0, 0)] * (img.ndim - 3) + [(0, ph), (0, pw), (0, 0)]
    return jnp.pad(img, pad), (h, w)


def crop_to(img: jax.Array, size: tuple[int, int]) -> jax.Array:
    """Crop NHWC from the top-left back to `size` = (H, W) (depad,
    reference utils/utils_unet.py:460-463)."""
    h, w = size
    return img[..., :h, :w, :]


def center_crop(img: jax.Array, size: tuple[int, int]) -> jax.Array:
    """Center-crop NHWC to `size` = (H, W).

    Matches torchvision CenterCrop for the even/odd split (used on encoder
    skips when same_padding=False, reference utils/utils_unet.py:379).
    Only supports crop sizes <= input size (the U-Net skip case).
    """
    h, w = img.shape[-3], img.shape[-2]
    th, tw = size
    if th > h or tw > w:
        raise ValueError(f"center_crop target {size} larger than input {(h, w)}")
    top = (h - th) // 2
    left = (w - tw) // 2
    return img[..., top : top + th, left : left + tw, :]
