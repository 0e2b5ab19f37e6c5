"""Pallas TPU kernel for the decode hot op: fused apply-gainmap.

The TPU analog of the reference's GLES fragment-shader backend
(/root/reference/lib/src/gpu/applygainmap_gl.cpp:17-186): one tile-resident
pass over the image computing

    SDR YUV (Rec601) -> RGB -> sRGB EOTF -> [gamut] -> gain factor
        -> output transfer -> packed RGBA1010102 / RGBAF16

per (8,128)-aligned VMEM tile, with the gain map at full resolution
(library-default map scale factor 1, jpegr.h:27-42; scaled maps run the
XLA path in ops/apply.py, whose IDW upsample needs cross-tile halos).

Kernel structure is channel-unrolled 2-D VPU math (Mosaic dislikes tiny
leading-dim reshapes/broadcasts); the per-channel metadata rides in SMEM.
The math is op-for-op the same as ops/apply.py, so kernel and XLA path
agree bit-for-bit (tests/test_pallas_apply.py — the analog of the
reference's NEON-vs-scalar tests, tests/gainmapmath_test.cpp:759)."""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..types import ColorGamut, ColorTransfer
from . import colors
from .lut_parity import (GAIN_FACTOR_N, HLG_OETF_N, PQ_OETF_N,
                         SRGB_INV_OETF_N, lut_quantize)

TILE_H, TILE_W = 256, 512


def _mat3(m, chans):
    """Static 3x3 matrix times a list of three 2-D channel arrays."""
    m = np.asarray(m, np.float32)
    return [m[r, 0] * chans[0] + m[r, 1] * chans[1] + m[r, 2] * chans[2]
            for r in range(3)]


def _apply_tile_channels(sdr3, gain3, meta, w_scalar, *, out_ct, sdr_cg,
                         hdr_cg, use_base_cg):
    """Per-tile math on channel lists of (th, tw) f32 arrays; `meta[i][c]`
    are SMEM scalars.  Identical op-for-op to apply_gainmap_core."""
    rgb_gamma = _mat3(np.asarray(colors.P3_YUV2RGB), sdr3)
    rgb_sdr = [colors.srgb_inv_oetf(
        lut_quantize(jnp.clip(c, 0.0, 1.0), SRGB_INV_OETF_N))
        for c in rgb_gamma]

    gamut_m = np.asarray(colors.gamut_conversion_matrix(hdr_cg, sdr_cg))
    if not use_base_cg:
        rgb_sdr = _mat3(gamut_m, rgb_sdr)

    rgb_hdr = []
    for c in range(3):
        gamma = meta[0][c]
        min_b, max_b = meta[1][c], meta[2][c]
        off_s, off_h = meta[3][c], meta[4][c]
        g = gain3[c]
        g = jnp.where(gamma != 1.0,
                      jnp.power(jnp.maximum(g, 0.0), 1.0 / gamma), g)
        g = lut_quantize(jnp.clip(g, 0.0, 1.0), GAIN_FACTOR_N)
        log_boost = jnp.log2(min_b) * (1.0 - g) + jnp.log2(max_b) * g
        rgb_hdr.append((rgb_sdr[c] + off_s)
                       * jnp.exp2(log_boost * w_scalar) - off_h)

    post_gamut = gamut_m if use_base_cg else np.eye(3, dtype=np.float32)
    if out_ct == ColorTransfer.LINEAR:
        rgb_hdr = _mat3(post_gamut, rgb_hdr)
        hi_lim = colors.MAX_PIXEL_FLOAT_HDR_LINEAR
        rgb_hdr = [jnp.clip(c, 0.0, hi_lim) for c in rgb_hdr]
        h16 = [jax.lax.bitcast_convert_type(c.astype(jnp.float16),
                                            jnp.uint16).astype(jnp.uint32)
               for c in rgb_hdr]
        lo = h16[0] | (h16[1] << 16)
        hi = h16[2] | (jnp.uint32(0x3C00) << 16)
        return lo, hi
    if out_ct == ColorTransfer.HLG:
        scale = colors.SDR_WHITE_NITS / colors.HLG_MAX_NITS
        rgb_hdr = _mat3(post_gamut, [c * scale for c in rgb_hdr])
        rgb_hdr = [jnp.clip(c, 0.0, 1.0) for c in rgb_hdr]
        rgb_hdr = [jnp.power(jnp.maximum(c, 0.0), 1.0 / 1.2)
                   for c in rgb_hdr]
        out = [colors.hlg_oetf(lut_quantize(c, HLG_OETF_N)) for c in rgb_hdr]
    else:  # PQ
        scale = colors.SDR_WHITE_NITS / colors.PQ_MAX_NITS
        rgb_hdr = _mat3(post_gamut, [c * scale for c in rgb_hdr])
        rgb_hdr = [jnp.clip(c, 0.0, 1.0) for c in rgb_hdr]
        out = [colors.pq_oetf(lut_quantize(c, PQ_OETF_N)) for c in rgb_hdr]
    # Mosaic has no f32->u32 cast; round into i32 first
    q = [jnp.round(jnp.clip(c, 0.0, 1.0) * 1023.0).astype(jnp.int32)
         .astype(jnp.uint32) for c in out]
    packed = q[0] | (q[1] << 10) | (q[2] << 20) | jnp.uint32(0x3 << 30)
    return packed, None


def _read_meta(meta_ref):
    return [[meta_ref[i, c] for c in range(3)] for i in range(5)]


def _kernel_1010102(meta_ref, w_ref, y_ref, u_ref, v_ref, g0_ref, g1_ref,
                    g2_ref, out_ref, *, out_ct, sdr_cg, hdr_cg, use_base_cg):
    packed, _ = _apply_tile_channels(
        [y_ref[...], u_ref[...], v_ref[...]],
        [g0_ref[...], g1_ref[...], g2_ref[...]],
        _read_meta(meta_ref), w_ref[0, 0], out_ct=out_ct, sdr_cg=sdr_cg,
        hdr_cg=hdr_cg, use_base_cg=use_base_cg)
    out_ref[...] = packed


def _kernel_f16(meta_ref, w_ref, y_ref, u_ref, v_ref, g0_ref, g1_ref,
                g2_ref, lo_ref, hi_ref, *, out_ct, sdr_cg, hdr_cg,
                use_base_cg):
    lo, hi = _apply_tile_channels(
        [y_ref[...], u_ref[...], v_ref[...]],
        [g0_ref[...], g1_ref[...], g2_ref[...]],
        _read_meta(meta_ref), w_ref[0, 0], out_ct=out_ct, sdr_cg=sdr_cg,
        hdr_cg=hdr_cg, use_base_cg=use_base_cg)
    lo_ref[...] = lo
    hi_ref[...] = hi


@functools.partial(jax.jit, static_argnames=(
    "out_ct", "sdr_cg", "hdr_cg", "use_base_cg", "interpret"))
def apply_gainmap_pallas(sdr_yuv, gain, meta_rows, weight, *,
                         out_ct: ColorTransfer, sdr_cg: ColorGamut,
                         hdr_cg: ColorGamut, use_base_cg: bool,
                         interpret: bool = False):
    """Tile-wise fused apply at map scale 1.

    sdr_yuv: (3, H, W) f32; gain: (3, H, W) f32 in [0,1] (1-channel maps
    broadcast by the caller); meta_rows: (5, 3) f32 rows
    [gamma, min_boost, max_boost, offset_sdr, offset_hdr]; weight: () f32.

    Returns packed uint32 (H, W) for HLG/PQ; for LINEAR, (H, W, 4) uint16
    RGBA half-floats."""
    h, w = sdr_yuv.shape[1], sdr_yuv.shape[2]
    th, tw = min(TILE_H, h), min(TILE_W, w)
    ph, pw = (-h) % th, (-w) % tw
    if ph or pw:
        sdr_yuv = jnp.pad(sdr_yuv, ((0, 0), (0, ph), (0, pw)))
        gain = jnp.pad(gain, ((0, 0), (0, ph), (0, pw)))
    hp, wp = h + ph, w + pw
    grid = (hp // th, wp // tw)
    chan_spec = pl.BlockSpec((th, tw), lambda i, j: (i, j),
                             memory_space=pltpu.VMEM)
    pre = [pl.BlockSpec((5, 3), lambda i, j: (0, 0),
                        memory_space=pltpu.SMEM),
           pl.BlockSpec((1, 1), lambda i, j: (0, 0),
                        memory_space=pltpu.SMEM)]
    out_spec32 = pl.BlockSpec((th, tw), lambda i, j: (i, j),
                              memory_space=pltpu.VMEM)
    weight_arr = jnp.asarray(weight, jnp.float32).reshape(1, 1)
    meta_rows = jnp.asarray(meta_rows, jnp.float32)
    chans = [sdr_yuv[0], sdr_yuv[1], sdr_yuv[2], gain[0], gain[1], gain[2]]

    kw = dict(out_ct=ColorTransfer(out_ct), sdr_cg=ColorGamut(sdr_cg),
              hdr_cg=ColorGamut(hdr_cg), use_base_cg=bool(use_base_cg))
    if ColorTransfer(out_ct) == ColorTransfer.LINEAR:
        lo, hi = pl.pallas_call(
            functools.partial(_kernel_f16, **kw),
            grid=grid,
            in_specs=pre + [chan_spec] * 6,
            out_specs=(out_spec32, out_spec32),
            out_shape=(jax.ShapeDtypeStruct((hp, wp), jnp.uint32),
                       jax.ShapeDtypeStruct((hp, wp), jnp.uint32)),
            interpret=interpret,
        )(meta_rows, weight_arr, *chans)
        lo, hi = lo[:h, :w], hi[:h, :w]
        comp = jnp.stack([lo & 0xFFFF, lo >> 16, hi & 0xFFFF, hi >> 16],
                         axis=-1).astype(jnp.uint16)
        return comp
    packed = pl.pallas_call(
        functools.partial(_kernel_1010102, **kw),
        grid=grid,
        in_specs=pre + [chan_spec] * 6,
        out_specs=out_spec32,
        out_shape=jax.ShapeDtypeStruct((hp, wp), jnp.uint32),
        interpret=interpret,
    )(meta_rows, weight_arr, *chans)
    return packed[:h, :w]


def meta_to_rows(metadata_arrays) -> np.ndarray:
    """metadata dict (ops/apply.metadata_to_arrays) -> (5,3) kernel rows."""
    return np.stack([metadata_arrays["gamma"],
                     metadata_arrays["min_content_boost"],
                     metadata_arrays["max_content_boost"],
                     metadata_arrays["offset_sdr"],
                     metadata_arrays["offset_hdr"]]).astype(np.float32)
