"""HDR -> SDR global tone mapping, fused whole-image pipeline.

Re-design of JpegR::toneMap (/root/reference/lib/src/jpegr.cpp:1853-2090) and
globalTonemap/ReinhardMap (jpegr.cpp:1813-1846).  The reference walks pixels
on <=4 CPU threads; here the entire pipeline —

    unpack -> YUV->RGB -> inverse OETF -> OOTF -> Reinhard(maxRGB)
           -> gamut(BT2100->P3) -> clamp -> sRGB OETF -> P3 RGB->YUV -> pack

— is one jit-compiled XLA program over (3, H, W) float32 arrays; XLA fuses it
into a few HBM-bandwidth-bound loops on the TPU VPU.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from ..types import ColorGamut, ColorTransfer, ImgFmt, RGB_FORMATS
from . import colors, pixel


def reinhard_map(y_hdr, headroom: float):
    """ReinhardMap (jpegr.cpp:1813-1817)."""
    out = (1.0 + y_hdr / (headroom * headroom)) / (1.0 + y_hdr)
    return out * y_hdr


def global_tonemap_rgb(rgb, headroom: float, is_normalized: bool):
    """globalTonemap (jpegr.cpp:1819-1846) vectorized over (3, H, W).

    Returns (sdr_rgb, y_hdr=maxRGB_hdr, y_sdr=maxRGB_sdr)."""
    rgb_hdr = rgb * headroom if is_normalized else rgb
    max_hdr = jnp.max(rgb_hdr, axis=0)
    max_sdr = reinhard_map(max_hdr, headroom)
    # x * max_sdr / max_hdr for positive x, else 0
    scale = jnp.where(max_hdr > 0.0, max_sdr / jnp.maximum(max_hdr, 1e-37), 0.0)
    rgb_sdr = jnp.where(rgb_hdr > 0.0, rgb_hdr * scale, 0.0)
    return rgb_sdr, max_hdr, max_sdr


def hdr_to_linear_rgb(hdr_vals, fmt: ImgFmt, cg: ColorGamut, ct: ColorTransfer):
    """Shared HDR front-end: gamma YUV/RGB (3,H,W) -> display-linear RGB.

    YUV->RGB (per gamut) for planar inputs, inverse OETF, HLG OOTF
    (jpegr.cpp:2015-2023)."""
    if ImgFmt(fmt) in RGB_FORMATS:
        rgb_gamma = hdr_vals
    else:
        rgb_gamma = colors.yuv_to_rgb(hdr_vals, colors.yuv2rgb_matrix_for_gamut(cg))
    rgb = colors.inv_oetf(rgb_gamma, ct)
    rgb = colors.ootf(rgb, ct, colors.luminance_coeffs_for_gamut(cg))
    return rgb


def tonemap_core(hdr_vals, fmt: ImgFmt, cg: ColorGamut, ct: ColorTransfer):
    """Full tonemap math: HDR gamma values -> SDR P3 sRGB gamma RGB (3,H,W).

    Output SDR color aspects are forced to (P3, sRGB, full range)
    (jpegr.cpp:1985-1987)."""
    rgb = hdr_to_linear_rgb(hdr_vals, fmt, cg, ct)
    hdr_white_nits = colors.reference_display_peak_nits(ct)
    is_normalized = ColorTransfer(ct) != ColorTransfer.LINEAR
    sdr_rgb, _, _ = global_tonemap_rgb(
        rgb, hdr_white_nits / colors.SDR_WHITE_NITS, is_normalized)
    gamut_m = colors.gamut_conversion_matrix(ColorGamut.DISPLAY_P3, cg)
    sdr_rgb = colors.convert_gamut(sdr_rgb, gamut_m)
    sdr_rgb = colors.clamp_pixel_float(sdr_rgb)
    return colors.srgb_oetf(sdr_rgb)


@functools.partial(jax.jit, static_argnames=("fmt", "cg", "ct", "out_yuv420"))
def tonemap_to_yuv(hdr_vals, fmt: ImgFmt, cg: ColorGamut, ct: ColorTransfer,
                   out_yuv420: bool = True):
    """Tonemap to packed SDR planes.

    P010 input -> YUV420 planes (2x2 chroma average, jpegr.cpp:2044-2070);
    YUV444_10 input -> YUV444 planes."""
    sdr_rgb_gamma = tonemap_core(hdr_vals, fmt, cg, ct)
    sdr_yuv = colors.rgb_to_yuv(sdr_rgb_gamma, colors.P3_RGB2YUV)
    if out_yuv420:
        return pixel.pack_yuv420(sdr_yuv)
    return pixel.pack_yuv444(sdr_yuv)


@functools.partial(jax.jit, static_argnames=("fmt", "cg", "ct"))
def tonemap_to_rgba8888(hdr_vals, fmt: ImgFmt, cg: ColorGamut, ct: ColorTransfer):
    """Tonemap RGB-format HDR input -> packed RGBA8888 (jpegr.cpp:2040-2042)."""
    sdr_rgb_gamma = tonemap_core(hdr_vals, fmt, cg, ct)
    return pixel.pack_rgba8888(sdr_rgb_gamma)
