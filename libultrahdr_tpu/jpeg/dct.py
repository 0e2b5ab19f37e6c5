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
    """Inverse 2-D DCT on (..., 8, 8): D^T @ X @ D (float reference form)."""
    d = jnp.asarray(dct_matrix())
    y = jnp.einsum("ji,...jk->...ik", d, coeffs, precision=_HI)
    return jnp.einsum("...ik,kl->...il", y, d, precision=_HI)


# Loeffler-Ligtenberg-Moshovitz fixed-point constants at CONST_BITS=13 —
# the scaled 13-bit roundings every libjpeg islow build uses, i.e. the
# arithmetic behind the reference's decoded base image
# (/root/reference/lib/src/jpegdecoderhelper.cpp:206-351 links libjpeg,
# whose jpeg_idct_islow is this butterfly).  round(f * 8192):
_K0_298631336 = 2446
_K0_390180644 = 3196
_K0_541196100 = 4433
_K0_765366865 = 6270
_K0_899976223 = 7373
_K1_175875602 = 9633
_K1_501321110 = 12299
_K1_847759065 = 15137
_K1_961570560 = 16069
_K2_053119869 = 16819
_K2_562915447 = 20995
_K3_072711026 = 25172


def _islow_butterfly(s):
    """One 1-D islow pass over 8 parallel int32 arrays, WITHOUT the final
    descale: returns the 8 outputs scaled by 2^13 relative to the inputs.
    Same int32 operation sequence as libjpeg, so results (including any
    wrap-around on adversarial streams) match it exactly."""
    s0, s1, s2, s3, s4, s5, s6, s7 = s
    # even part
    z1 = (s2 + s6) * _K0_541196100
    e2 = z1 - s6 * _K1_847759065
    e3 = z1 + s2 * _K0_765366865
    e0 = (s0 + s4) * 8192
    e1 = (s0 - s4) * 8192
    t10, t13 = e0 + e3, e0 - e3
    t11, t12 = e1 + e2, e1 - e2
    # odd part
    t0, t1, t2, t3 = s7, s5, s3, s1
    z1, z2 = t0 + t3, t1 + t2
    z3, z4 = t0 + t2, t1 + t3
    z5 = (z3 + z4) * _K1_175875602
    t0 = t0 * _K0_298631336
    t1 = t1 * _K2_053119869
    t2 = t2 * _K3_072711026
    t3 = t3 * _K1_501321110
    z1 = z1 * -_K0_899976223
    z2 = z2 * -_K2_562915447
    z3 = z3 * -_K1_961570560 + z5
    z4 = z4 * -_K0_390180644 + z5
    t0 = t0 + z1 + z3
    t1 = t1 + z2 + z4
    t2 = t2 + z2 + z3
    t3 = t3 + z1 + z4
    return (t10 + t3, t11 + t2, t12 + t1, t13 + t0,
            t13 - t0, t12 - t1, t11 - t2, t10 - t3)


def _descale(x, n):
    """libjpeg DESCALE: round-half-up arithmetic shift."""
    return jax.lax.shift_right_arithmetic(x + (1 << (n - 1)), n)


def idct8x8_islow(deq):
    """Bit-exact libjpeg jpeg_idct_islow on int32 dequantized blocks
    (..., 8, 8) -> int32 spatial samples in [-inf, inf] (callers add 128
    and clamp).  Two butterfly passes entirely in int32 elementwise ops —
    VPU work XLA fuses into the surrounding program; the float MXU form
    (idct8x8) stays for paths that don't need bitwise libjpeg parity."""
    # pass 1: columns (axis -2), PASS1_BITS=2 kept in: descale 13-2=11
    cols = [deq[..., u, :] for u in range(8)]
    t = _islow_butterfly(cols)
    t = jnp.stack([_descale(x, 11) for x in t], axis=-2)
    # pass 2: rows (axis -1), descale 13+2+3=18
    rows = [t[..., :, v] for v in range(8)]
    o = _islow_butterfly(rows)
    return jnp.stack([_descale(x, 18) for x in o], axis=-1)


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


def range_limit(sample):
    """libjpeg's post-IDCT range_limit table (jdmaster.c
    prepare_range_limit_table) as a closed form over `sample` = IDCT
    output + 128: index m = sample & RANGE_MASK(1023), then
    m<256 -> m, m<640 -> 255, else 0.  Identical to clip(0,255) for
    in-range samples; on corrupt streams whose IDCT outputs leave
    [-128, 511] it reproduces libjpeg's wrap behavior exactly (mapping
    verified empirically against libjpeg-turbo's C islow across all
    1024 residues, four quant scales, zero conflicts)."""
    m = sample & 1023  # two's-complement & == mod 1024 for negatives too
    return jnp.where(m < 256, m, jnp.where(m < 640, 255, 0))


def inverse_plane(zz_coeffs, qtable_natural, out_h: int, out_w: int):
    """(bh, bw, 64) int16 zigzag coeffs -> uint8 (out_h, out_w) plane.

    Bit-identical to libjpeg's islow decode (idct8x8_islow + the
    range_limit wrap table), so the XLA general/device engines reproduce
    the native host engine and the reference binary exactly at the
    YCbCr-plane level — including on corrupt entropy data (the decode
    differential-fuzz oracle runs the reference with JSIMD_FORCENONE=1,
    since libjpeg-turbo's own SIMD IDCT diverges from its C islow on
    out-of-range coefficients)."""
    nat = jnp.take(zz_coeffs, jnp.asarray(INV_ZIGZAG), axis=-1)
    deq = nat.astype(jnp.int32) * jnp.asarray(
        qtable_natural, jnp.int32).reshape(64)
    blocks = deq.reshape(*deq.shape[:-1], 8, 8)
    spatial = idct8x8_islow(blocks) + 128
    plane = unblockify(range_limit(spatial).astype(jnp.uint8))
    return plane[:out_h, :out_w]
