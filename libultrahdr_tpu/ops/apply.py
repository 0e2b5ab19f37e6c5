"""Decode: apply gain map to the SDR base -> HDR output, fused pipeline.

Re-design of JpegR::applyGainMap (/root/reference/lib/src/jpegr.cpp:1448-1699)
and applyGain/GainLUT (gainmapmath.cpp:791-855, gainmapmath.h:452-495) — the
direct analog of the reference's GLES fragment-shader backend
(gpu/applygainmap_gl.cpp), recast as one XLA program:

    SDR YUV (Rec601) -> RGB -> sRGB EOTF -> [gamut] -> x gainFactor
        -> output transfer (linear F16 | HLG 1010102 | PQ 1010102)

The gain LUT becomes grid-quantized exact math (ops.lut_parity).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..types import ColorGamut, ColorTransfer
from . import colors, idw, pixel
from .lut_parity import (GAIN_FACTOR_N, HLG_OETF_N, PQ_OETF_N,
                         SRGB_INV_OETF_N, lut_quantize)


def gainmap_weight(max_display_boost: float, cap_min: float, cap_max: float) -> float:
    """display_boost / weight computation (jpegr.cpp:1556-1568)."""
    display_boost = min(max_display_boost, cap_max)
    if display_boost != cap_max:
        w = (np.log2(display_boost) - np.log2(cap_min)) / \
            (np.log2(cap_max) - np.log2(cap_min))
        return float(np.clip(w, 0.0, 1.0))
    return 1.0


def apply_gain(rgb_sdr, gain, metadata_arrays, weight: float):
    """applyGainLUT (gainmapmath.cpp:849-855 + GainLUT, gainmapmath.h:452-495).

    gain: (C, H, W) normalized [0,1] gain samples (C=1 broadcasts).
    metadata_arrays: dict of per-channel (3,) f32 numpy arrays.
    Returns linear HDR RGB referenced to SDR white (x1 = 203 nits)."""
    gamma = jnp.asarray(metadata_arrays["gamma"], jnp.float32).reshape(3, 1, 1)
    min_b = jnp.asarray(metadata_arrays["min_content_boost"], jnp.float32).reshape(3, 1, 1)
    max_b = jnp.asarray(metadata_arrays["max_content_boost"], jnp.float32).reshape(3, 1, 1)
    off_sdr = jnp.asarray(metadata_arrays["offset_sdr"], jnp.float32).reshape(3, 1, 1)
    off_hdr = jnp.asarray(metadata_arrays["offset_hdr"], jnp.float32).reshape(3, 1, 1)

    if gain.shape[0] == 1:
        gain = jnp.broadcast_to(gain, (3,) + gain.shape[1:])
    g = jnp.where(gamma != 1.0,
                  jnp.power(jnp.maximum(gain, 0.0), 1.0 / gamma), gain)
    # GainLUT::getGainFactor quantizes the (post-gamma) gain to the 1024-grid
    g = lut_quantize(jnp.clip(g, 0.0, 1.0), GAIN_FACTOR_N)
    log_boost = jnp.log2(min_b) * (1.0 - g) + jnp.log2(max_b) * g
    gain_factor = jnp.exp2(log_boost * weight)
    return (rgb_sdr + off_sdr) * gain_factor - off_hdr


def _gain_to_float(g):
    """Gain samples to normalized f32: u8 maps /255; float dtypes pass
    through (the fractional map-scale path pre-upsamples in float and must
    not re-quantize, matching the reference's float sampleMap,
    gainmapmath.cpp:871-921)."""
    if jnp.issubdtype(g.dtype, jnp.floating):
        return g.astype(jnp.float32)
    return g.astype(jnp.float32) / 255.0


@functools.partial(jax.jit, static_argnames=(
    "scale_k", "out_ct", "sdr_cg", "hdr_cg", "use_base_cg", "use_pallas"))
def apply_gainmap_core(sdr_yuv, gain_u8, metadata_arrays, *, scale_k: int,
                       weight, out_ct: ColorTransfer,
                       sdr_cg: ColorGamut, hdr_cg: ColorGamut,
                       use_base_cg: bool, gain_halo_row=None,
                       edge_is_last=None, use_pallas: bool = True):
    """Fused decode: SDR YUV (3,H,W) + gain map (C,mh,mw) u8 -> packed output.

    Output dtype: uint64 RGBAF16 (LINEAR) or uint32 RGBA1010102 (HLG/PQ)
    (jpegr.cpp:1636-1680).

    gain_halo_row / edge_is_last: row-sharded IDW halo inputs (the next
    shard's first map row + traced is-bottom-shard flag) — see
    idw.idw_upsample_sharded; None for the single-device path."""
    h, w = sdr_yuv.shape[1], sdr_yuv.shape[2]
    out_ct_e = ColorTransfer(out_ct)
    if (use_pallas and scale_k == 1 and gain_halo_row is None
            and jax.default_backend() != "cpu"
            and out_ct_e in (ColorTransfer.HLG, ColorTransfer.PQ,
                             ColorTransfer.LINEAR)):
        # TPU: tile-resident Pallas kernel (ops/pallas_apply.py), the GLES
        # shader analog; math identical, transcendentals may differ by 1 ulp
        from . import pallas_apply
        g = gain_u8
        if g.shape[0] == 1:
            g = jnp.broadcast_to(g, (3,) + g.shape[1:])
        rows = jnp.stack([
            jnp.asarray(metadata_arrays["gamma"], jnp.float32),
            jnp.asarray(metadata_arrays["min_content_boost"], jnp.float32),
            jnp.asarray(metadata_arrays["max_content_boost"], jnp.float32),
            jnp.asarray(metadata_arrays["offset_sdr"], jnp.float32),
            jnp.asarray(metadata_arrays["offset_hdr"], jnp.float32)])
        return pallas_apply.apply_gainmap_pallas(
            sdr_yuv, _gain_to_float(g), rows,
            jnp.asarray(weight, jnp.float32), out_ct=out_ct_e,
            sdr_cg=sdr_cg, hdr_cg=hdr_cg, use_base_cg=use_base_cg)
    # JPEG-decoded base: always Rec.601 YUV coefficients (jpegr.cpp:1592)
    rgb_gamma = colors.yuv_to_rgb(sdr_yuv, colors.P3_YUV2RGB)
    rgb_sdr = colors.srgb_inv_oetf(
        lut_quantize(jnp.clip(rgb_gamma, 0.0, 1.0), SRGB_INV_OETF_N))

    gamut_m = colors.gamut_conversion_matrix(hdr_cg, sdr_cg)
    if not use_base_cg:
        rgb_sdr = colors.convert_gamut(rgb_sdr, gamut_m)

    gain_f = _gain_to_float(gain_u8)
    if gain_halo_row is not None and scale_k > 1:
        gain = idw.idw_upsample_sharded(
            gain_f, _gain_to_float(gain_halo_row),
            edge_is_last, scale_k, h, w)
    else:
        gain = idw.idw_upsample(gain_f, scale_k, h, w)
    rgb_hdr = apply_gain(rgb_sdr, gain, metadata_arrays, weight)

    if use_base_cg:
        post_gamut = gamut_m
    else:
        post_gamut = colors._IDENTITY3

    out_ct = ColorTransfer(out_ct)
    if out_ct == ColorTransfer.LINEAR:
        rgb_hdr = colors.convert_gamut(rgb_hdr, post_gamut)
        rgb_hdr = colors.clamp_pixel_float_linear(rgb_hdr)
        return pixel.pack_rgbaf16(rgb_hdr)
    if out_ct == ColorTransfer.HLG:
        rgb_hdr = rgb_hdr * (colors.SDR_WHITE_NITS / colors.HLG_MAX_NITS)
        rgb_hdr = colors.convert_gamut(rgb_hdr, post_gamut)
        rgb_hdr = colors.clamp_pixel_float(rgb_hdr)
        # hlgInverseOotfApprox (gainmapmath.cpp:304-306): per-channel pow(1/1.2)
        rgb_hdr = jnp.power(jnp.maximum(rgb_hdr, 0.0), 1.0 / 1.2)
        rgb_gamma_hdr = colors.hlg_oetf(lut_quantize(rgb_hdr, HLG_OETF_N))
        return pixel.pack_rgba1010102(rgb_gamma_hdr)
    if out_ct == ColorTransfer.PQ:
        rgb_hdr = rgb_hdr * (colors.SDR_WHITE_NITS / colors.PQ_MAX_NITS)
        rgb_hdr = colors.convert_gamut(rgb_hdr, post_gamut)
        rgb_hdr = colors.clamp_pixel_float(rgb_hdr)
        rgb_gamma_hdr = colors.pq_oetf(lut_quantize(rgb_hdr, PQ_OETF_N))
        return pixel.pack_rgba1010102(rgb_gamma_hdr)
    raise ValueError(f"unsupported decode output transfer {out_ct}")


def metadata_to_arrays(metadata) -> dict:
    """GainMapMetadata -> dict of (3,) float32 arrays for the jit kernel."""
    return {
        "gamma": np.asarray(metadata.gamma, np.float32),
        "min_content_boost": np.asarray(metadata.min_content_boost, np.float32),
        "max_content_boost": np.asarray(metadata.max_content_boost, np.float32),
        "offset_sdr": np.asarray(metadata.offset_sdr, np.float32),
        "offset_hdr": np.asarray(metadata.offset_hdr, np.float32),
    }
