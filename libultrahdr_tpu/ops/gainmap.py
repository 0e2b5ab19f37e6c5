"""Gain map generation: log2(HDR/SDR) maps, one-pass and two-pass.

Re-design of JpegR::generateGainMap (/root/reference/lib/src/jpegr.cpp:524-1051)
and the per-pixel primitives encodeGain/computeGain/affineMapGain
(gainmapmath.cpp:753-789).  The reference's row-sharded thread pool becomes a
single fused XLA program; the two-pass min/max reduction becomes jnp.min/max
(and a psum-style cross-device reduction in the sharded batch path,
parallel/batch.py).

Inputs are the unpacked (3, H, W) float32 SDR and HDR gamma-value arrays from
ops.pixel.unpack; output is the uint8 gain map (1 or 3 channels at
H//scale x W//scale) plus metadata fields.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from ..types import ColorGamut, ColorTransfer, ImgFmt, RGB_FORMATS
from . import colors, pixel
from .lut_parity import SRGB_INV_OETF_N, lut_quantize

# two-pass gain clamp bounds (jpegr.cpp:965-969)
GAIN_LOG2_MIN = -14.3
GAIN_LOG2_MAX = 15.6
# one-pass dark-pixel gain cap (gainmapmath.cpp:773-782)
DARK_SDR_THRESHOLD = 2.0 / 255.0
DARK_GAIN_CAP = 2.3


class GainmapPrep(NamedTuple):
    """Linear-light nits-domain SDR/HDR values at gain map resolution."""

    sdr_rgb: jnp.ndarray  # (3, mh, mw) linear SDR, [0,1] scale (pre-nits)
    hdr_rgb: jnp.ndarray  # (3, mh, mw) linear HDR, [0,1] scale (pre-nits)
    hdr_sample_to_nits: float


def _prep(sdr_vals, hdr_vals, sdr_fmt, hdr_fmt, sdr_cg, hdr_cg, ct,
          scale: int, sdr_is_601: bool, use_base_cg: bool):
    """Common front-end of both passes (jpegr.cpp:746-788 / :859-900):

    box-downsample by `scale`, YUV->RGB, sRGB inverse OETF (LUT grid) for SDR,
    inverse OETF + OOTF for HDR, gamut conversion to the common space,
    clip negatives."""
    sdr_ds = pixel.box_downsample(sdr_vals, scale)
    hdr_ds = pixel.box_downsample(hdr_vals, scale)

    if ImgFmt(sdr_fmt) in RGB_FORMATS:
        sdr_rgb_gamma = sdr_ds
    else:
        m = colors.P3_YUV2RGB if sdr_is_601 else colors.yuv2rgb_matrix_for_gamut(sdr_cg)
        sdr_rgb_gamma = colors.yuv_to_rgb(sdr_ds, m)
    sdr_rgb = colors.srgb_inv_oetf(
        lut_quantize(jnp.clip(sdr_rgb_gamma, 0.0, 1.0), SRGB_INV_OETF_N))

    if ImgFmt(hdr_fmt) in RGB_FORMATS:
        hdr_rgb_gamma = hdr_ds
    else:
        hdr_rgb_gamma = colors.yuv_to_rgb(hdr_ds, colors.yuv2rgb_matrix_for_gamut(hdr_cg))
    hdr_rgb = colors.inv_oetf(hdr_rgb_gamma, ct)
    hdr_rgb = colors.ootf(hdr_rgb, ct, colors.luminance_coeffs_for_gamut(hdr_cg))

    # gamut conversion direction (jpegr.cpp:600-646): if use_base_cg, HDR is
    # converted into the SDR gamut; else SDR into the HDR gamut.
    if ColorGamut(sdr_cg) != ColorGamut(hdr_cg):
        if use_base_cg:
            hdr_rgb = colors.convert_gamut(hdr_rgb, colors.gamut_conversion_matrix(sdr_cg, hdr_cg))
        else:
            sdr_rgb = colors.convert_gamut(sdr_rgb, colors.gamut_conversion_matrix(hdr_cg, sdr_cg))
    sdr_rgb = colors.clip_negatives(sdr_rgb)
    hdr_rgb = colors.clip_negatives(hdr_rgb)

    hdr_white_nits = colors.reference_display_peak_nits(ct)
    to_nits = colors.SDR_WHITE_NITS if ColorTransfer(ct) == ColorTransfer.LINEAR else hdr_white_nits
    return GainmapPrep(sdr_rgb, hdr_rgb, to_nits)


def _nits_pair(prep: GainmapPrep, multichannel: bool, use_luminance: bool, sdr_cg):
    """sdr/hdr nit values to ratio: per-channel (3,mh,mw) or maxRGB/luma (1,mh,mw)."""
    if multichannel:
        sdr = prep.sdr_rgb * colors.SDR_WHITE_NITS
        hdr = prep.hdr_rgb * prep.hdr_sample_to_nits
    else:
        if use_luminance:
            lum = colors.luminance_coeffs_for_gamut(sdr_cg)
            s = colors.luminance(prep.sdr_rgb, lum)
            h = colors.luminance(prep.hdr_rgb, lum)
        else:
            s = jnp.max(prep.sdr_rgb, axis=0)
            h = jnp.max(prep.hdr_rgb, axis=0)
        sdr = (s * colors.SDR_WHITE_NITS)[None]
        hdr = (h * prep.hdr_sample_to_nits)[None]
    return sdr, hdr


def encode_gain(sdr_nits, hdr_nits, min_boost, max_boost, gamma):
    """encodeGain (gainmapmath.cpp:753-771), vectorized.

    min/max_boost are per-channel linear boosts (broadcast over (C,mh,mw));
    output uint8 = trunc(pow(norm, gamma) * 255)."""
    gain = jnp.where(sdr_nits > 0.0, hdr_nits / jnp.maximum(sdr_nits, 1e-37), 1.0)
    gain = jnp.clip(gain, min_boost, max_boost)
    log2min, log2max = jnp.log2(min_boost), jnp.log2(max_boost)
    norm = (jnp.log2(gain) - log2min) / (log2max - log2min)
    norm_g = jnp.power(norm, gamma)
    return jnp.clip(norm_g * 255.0, 0.0, 255.0).astype(jnp.uint8)


def compute_gain(sdr_nits, hdr_nits):
    """computeGain (gainmapmath.cpp:773-782): log2 ratio with offsets and the
    dark-pixel 2.3 cap."""
    g = jnp.log2((hdr_nits + colors.HDR_OFFSET) / (sdr_nits + colors.SDR_OFFSET))
    # NB: the reference compares the *nits* value against 2/255 (its inputs
    # are already in nits) — matched verbatim for parity.
    return jnp.where(sdr_nits < DARK_SDR_THRESHOLD, jnp.minimum(g, DARK_GAIN_CAP), g)


def affine_map_gain(gainlog2, mingainlog2, maxgainlog2, gamma):
    """affineMapGain (gainmapmath.cpp:784-789): normalize, gamma, quantize
    with +0.5 rounding."""
    mapped = (gainlog2 - mingainlog2) / (maxgainlog2 - mingainlog2)
    mapped = jnp.where(gamma != 1.0, jnp.power(jnp.maximum(mapped, 0.0), gamma), mapped)
    return jnp.clip(mapped * 255.0 + 0.5, 0.0, 255.0).astype(jnp.uint8)


@functools.partial(jax.jit, static_argnames=(
    "sdr_fmt", "hdr_fmt", "sdr_cg", "hdr_cg", "ct", "scale", "multichannel",
    "use_luminance", "sdr_is_601", "use_base_cg"))
def generate_gainmap_onepass(sdr_vals, hdr_vals, *, sdr_fmt, hdr_fmt, sdr_cg,
                             hdr_cg, ct, scale: int, multichannel: bool,
                             gamma: float, use_luminance: bool,
                             sdr_is_601: bool, use_base_cg: bool,
                             max_boost: float):
    """One-pass (REALTIME) gain map (jpegr.cpp:712-828).

    Metadata is fixed a-priori: max_content_boost = hdr_white/203 (passed in
    as `max_boost`), min = 1.  Returns (C, mh, mw) uint8."""
    prep = _prep(sdr_vals, hdr_vals, sdr_fmt, hdr_fmt, sdr_cg, hdr_cg, ct,
                 scale, sdr_is_601, use_base_cg)
    sdr_nits, hdr_nits = _nits_pair(prep, multichannel, use_luminance, sdr_cg)
    return encode_gain(sdr_nits, hdr_nits, jnp.float32(1.0),
                       jnp.float32(max_boost), jnp.float32(gamma))


@functools.partial(jax.jit, static_argnames=(
    "sdr_fmt", "hdr_fmt", "sdr_cg", "hdr_cg", "ct", "scale", "multichannel",
    "use_luminance", "sdr_is_601", "use_base_cg"))
def gainmap_float_pass(sdr_vals, hdr_vals, *, sdr_fmt, hdr_fmt, sdr_cg, hdr_cg,
                       ct, scale: int, multichannel: bool, use_luminance: bool,
                       sdr_is_601: bool, use_base_cg: bool):
    """Two-pass pass 1 (jpegr.cpp:859-960): float log2 gains + per-channel
    min/max reduction.  Returns (gains (C,mh,mw) f32, min (C,), max (C,))."""
    prep = _prep(sdr_vals, hdr_vals, sdr_fmt, hdr_fmt, sdr_cg, hdr_cg, ct,
                 scale, sdr_is_601, use_base_cg)
    sdr_nits, hdr_nits = _nits_pair(prep, multichannel, use_luminance, sdr_cg)
    gains = compute_gain(sdr_nits, hdr_nits)
    # thread-local seeds 127 / -128 (jpegr.cpp:843-845) bound the reduction
    gmin = jnp.minimum(jnp.min(gains, axis=(1, 2)), 127.0)
    gmax = jnp.maximum(jnp.max(gains, axis=(1, 2)), -128.0)
    return gains, gmin, gmax


def resolve_boost_bounds(gmin: np.ndarray, gmax: np.ndarray, *,
                         multichannel: bool, min_content_boost: float | None,
                         max_content_boost: float | None,
                         merge_channels: bool) -> tuple[np.ndarray, np.ndarray]:
    """Host-side metadata resolution between the passes (jpegr.cpp:947-981):
    optional channel merge (XMP mode), clamp to [-14.3, 15.6], apply user
    suggestions, epsilon-separate equal bounds."""
    n = 3 if multichannel else 1
    gmin = np.array(gmin[:n], np.float32)
    gmax = np.array(gmax[:n], np.float32)
    if merge_channels:
        gmin[:] = gmin.min()
        gmax[:] = gmax.max()
    gmin = np.clip(gmin, GAIN_LOG2_MIN, GAIN_LOG2_MAX)
    gmax = np.clip(gmax, GAIN_LOG2_MIN, GAIN_LOG2_MAX)
    if max_content_boost is not None:
        gmax = np.minimum(gmax, np.float32(np.log2(max_content_boost)))
    if min_content_boost is not None:
        gmin = np.maximum(gmin, np.float32(np.log2(min_content_boost)))
    eps = np.finfo(np.float32).eps
    gmax = np.where(np.abs(gmax - gmin) < eps, gmax + np.float32(0.1), gmax)
    return gmin, gmax


@jax.jit
def encode_gainmap_twopass(gains, gmin, gmax, gamma):
    """Two-pass pass 2 (encodeMap, jpegr.cpp:983-1027): affine quantization
    with the resolved per-channel bounds."""
    c = gains.shape[0]
    return affine_map_gain(gains, gmin[:c].reshape(c, 1, 1),
                           gmax[:c].reshape(c, 1, 1), gamma)
