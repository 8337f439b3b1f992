"""Parity tests for image geometry ops against torch CPU numerics.

The reference pipeline uses torchvision functional ops; torchvision is not
installed here, so the goldens replicate its exact internals with plain
torch (F.interpolate for resize; the documented affine-grid + grid_sample
construction of torchvision 0.10's rotate).
"""

import math

import jax.numpy as jnp
import numpy as np
import pytest
import torch
import torch.nn.functional as F

from unet_research_tpu.ops import (
    center_crop,
    crop_to,
    pad_to_multiple,
    resize_bilinear,
    rotate_bilinear,
    square_pad,
)


def torch_rotate_golden(img_nchw: torch.Tensor, angle: float) -> torch.Tensor:
    """torchvision 0.10 F.rotate(bilinear, expand=False, fill=0, center=None),
    reconstructed from its _get_inverse_affine_matrix + _gen_affine_grid +
    grid_sample(align_corners=False) composition."""
    n, c, h, w = img_nchw.shape
    rot = math.radians(-angle)
    theta = torch.tensor(
        [[math.cos(rot), math.sin(rot), 0.0], [-math.sin(rot), math.cos(rot), 0.0]],
        dtype=torch.float32,
    ).unsqueeze(0)
    d = 0.5
    x_grid = torch.linspace(-w * 0.5 + d, w * 0.5 + d - 1, steps=w)
    y_grid = torch.linspace(-h * 0.5 + d, h * 0.5 + d - 1, steps=h)
    base = torch.empty(1, h, w, 3)
    base[..., 0] = x_grid
    base[..., 1] = y_grid.unsqueeze(-1)
    base[..., 2] = 1.0
    rescaled = theta.transpose(1, 2) / torch.tensor([0.5 * w, 0.5 * h])
    grid = base.view(1, h * w, 3).bmm(rescaled).view(1, h, w, 2)
    grid = grid.expand(n, h, w, 2)
    return F.grid_sample(img_nchw, grid, mode="bilinear", padding_mode="zeros", align_corners=False)


def nchw_to_nhwc(t: torch.Tensor) -> np.ndarray:
    return t.permute(0, 2, 3, 1).numpy()


@pytest.mark.parametrize("out_size", [(32, 32), (128, 128), (64, 100), (300, 290)])
@pytest.mark.parametrize("in_size", [(58, 57), (117, 113)])
def test_resize_matches_torch(rng, in_size, out_size):
    x = rng.random((2, *in_size, 3), dtype=np.float32)
    ours = np.asarray(resize_bilinear(jnp.asarray(x), out_size))
    xt = torch.from_numpy(x).permute(0, 3, 1, 2)
    ref = F.interpolate(xt, size=out_size, mode="bilinear", align_corners=False)
    np.testing.assert_allclose(ours, nchw_to_nhwc(ref), rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("angle", [0.0, 1.0, 37.5, 90.0, 180.0, 271.0, -45.0, 359.0])
def test_rotate_matches_torch(rng, angle):
    x = rng.random((1, 37, 45, 2), dtype=np.float32)
    ours = np.asarray(rotate_bilinear(jnp.asarray(x), angle))
    ref = torch_rotate_golden(torch.from_numpy(x).permute(0, 3, 1, 2), angle)
    np.testing.assert_allclose(ours, nchw_to_nhwc(ref), rtol=1e-4, atol=1e-5)


def test_rotate_roundtrip_mass(rng):
    # rotating there and back keeps interior mass approximately
    x = np.zeros((1, 64, 64, 1), dtype=np.float32)
    x[0, 20:44, 20:44, 0] = 1.0
    out = rotate_bilinear(rotate_bilinear(jnp.asarray(x), 33.0), -33.0)
    assert abs(float(jnp.sum(out)) - x.sum()) / x.sum() < 0.05


def test_square_pad_matches_reference_split(rng):
    # reference utils_general.py:32-43: bottom gets the extra height pixel,
    # LEFT gets the extra width pixel.
    x = rng.random((1, 5, 8, 1), dtype=np.float32)
    out = np.asarray(square_pad(jnp.asarray(x)))
    assert out.shape == (1, 8, 8, 1)
    top, bot = 1, 2  # total 3: top=3//2=1, bot=2
    np.testing.assert_array_equal(out[:, top : top + 5, :, :], x[:, :, :, :] * 0 + out[:, 1:6])
    assert np.all(out[:, 0, :, :] == 0) and np.all(out[:, 6:, :, :] == 0)
    np.testing.assert_allclose(out[:, 1:6, 0:8, :], x)

    y = rng.random((1, 8, 5, 1), dtype=np.float32)
    outy = np.asarray(square_pad(jnp.asarray(y)))
    assert outy.shape == (1, 8, 8, 1)
    # total 3: right=1, left=2
    np.testing.assert_allclose(outy[:, :, 2:7, :], y)
    assert np.all(outy[:, :, :2, :] == 0) and np.all(outy[:, :, 7:, :] == 0)


def test_pad_to_multiple_roundtrip(rng):
    x = rng.random((2, 584, 565, 1), dtype=np.float32)
    padded, orig = pad_to_multiple(jnp.asarray(x), 16)
    assert padded.shape == (2, 592, 576, 1)
    assert orig == (584, 565)
    back = crop_to(padded, orig)
    np.testing.assert_array_equal(np.asarray(back), x)


def test_center_crop_even_odd(rng):
    x = rng.random((1, 10, 11, 1), dtype=np.float32)
    out = np.asarray(center_crop(jnp.asarray(x), (6, 7)))
    # torch CenterCrop: top = (10-6)//2 = 2, left = (11-7)//2 = 2
    np.testing.assert_array_equal(out, x[:, 2:8, 2:9, :])
