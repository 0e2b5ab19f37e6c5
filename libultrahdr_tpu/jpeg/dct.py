"""Batched 8x8 DCT / quantization on TPU.

The transform half of the JPEG codec (the reference's libjpeg jcdctmgr/jddctmgr
ISLOW path, dispatched from jpegencoderhelper.cpp:198 / jpegdecoderhelper.cpp).
Instead of per-block scalar DCTs, each plane is reshaped to expose the two
8-point axes and transformed with two small matrix contractions — batched
matmuls XLA maps onto the MXU — followed by fused quantize + zigzag.

All math in f32 with HIGHEST precision (bf16 passes would blow the <1-LSB
coefficient accuracy budget).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from .tables import INV_ZIGZAG, ZIGZAG_ORDER

_HI = jax.lax.Precision.HIGHEST


@functools.lru_cache(maxsize=1)
def dct_matrix() -> np.ndarray:
    """Orthonormal 8-point DCT-II matrix D.

    The separable orthonormal 2-D transform D x D^T equals the T.81 Annex A
    FDCT exactly (the 1/4 C(u)C(v) normalization is the product of the two
    1-D scale factors), so quant tables apply directly."""
    k = np.arange(8)
    d = 0.5 * np.cos((2 * k[None, :] + 1) * k[:, None] * np.pi / 16.0)
    d[0, :] = np.sqrt(1.0 / 8.0)
    return d.astype(np.float32)


def pad_to_block_multiple(plane, fill=None):
    """Pad (H, W) to multiples of 8 by edge replication (fill overrides)."""
    h, w = plane.shape
    ph, pw = (-h) % 8, (-w) % 8
    if ph == 0 and pw == 0:
        return plane
    if fill is None:
        return jnp.pad(plane, ((0, ph), (0, pw)), mode="edge")
    return jnp.pad(plane, ((0, ph), (0, pw)), constant_values=fill)


def blockify(plane):
    """(H, W) -> (bh, bw, 8, 8); H, W must be multiples of 8."""
    h, w = plane.shape
    return plane.reshape(h // 8, 8, w // 8, 8).transpose(0, 2, 1, 3)


def unblockify(blocks):
    """(bh, bw, 8, 8) -> (bh*8, bw*8)."""
    bh, bw = blocks.shape[0], blocks.shape[1]
    return blocks.transpose(0, 2, 1, 3).reshape(bh * 8, bw * 8)


def fdct8x8(blocks):
    """Forward 2-D DCT on (..., 8, 8): D @ x @ D^T."""
    d = jnp.asarray(dct_matrix())
    y = jnp.einsum("ij,...jk->...ik", d, blocks, precision=_HI)
    return jnp.einsum("...ik,kl->...il", y, d.T, precision=_HI)


def idct8x8(coeffs):
    """Inverse 2-D DCT on (..., 8, 8): D^T @ X @ D."""
    d = jnp.asarray(dct_matrix())
    y = jnp.einsum("ji,...jk->...ik", d, coeffs, precision=_HI)
    return jnp.einsum("...ik,kl->...il", y, d, precision=_HI)


def forward_plane(plane_u8, qtable_natural):
    """uint8 (H, W) plane -> zigzagged quantized coefficients
    (bh, bw, 64) int16.  Level shift -128, FDCT, quantize (round-half-even
    like libjpeg ISLOW's descale), zigzag reorder."""
    x = plane_u8.astype(jnp.float32) - 128.0
    blocks = blockify(x)
    coeffs = fdct8x8(blocks)
    q = jnp.asarray(qtable_natural, jnp.float32).reshape(8, 8)
    quant = jnp.round(coeffs / q).astype(jnp.int16)
    flat = quant.reshape(*quant.shape[:-2], 64)
    return jnp.take(flat, jnp.asarray(ZIGZAG_ORDER), axis=-1)


def inverse_plane(zz_coeffs, qtable_natural, out_h: int, out_w: int):
    """(bh, bw, 64) int16 zigzag coeffs -> uint8 (out_h, out_w) plane."""
    nat = jnp.take(zz_coeffs, jnp.asarray(INV_ZIGZAG), axis=-1)
    deq = nat.astype(jnp.float32) * jnp.asarray(
        qtable_natural, jnp.float32).reshape(64)
    blocks = deq.reshape(*deq.shape[:-1], 8, 8)
    spatial = idct8x8(blocks)
    plane = unblockify(spatial) + 128.0
    plane = jnp.clip(jnp.round(plane), 0.0, 255.0).astype(jnp.uint8)
    return plane[:out_h, :out_w]
