"""Pixel format unpack/pack: raw integer planes <-> planar float32 (3, H, W).

Replaces the reference's per-pixel get/sample/put function tables
(/root/reference/lib/src/gainmapmath.cpp:354-607, selectors :1221-1269) with
whole-image vectorized transforms.  Subsampled chroma is unpacked to full
resolution by replication — numerically identical to getYuv420Pixel-style
nearest indexing (x/h_factor, y/v_factor) — so every downstream consumer
(tonemap, gainmap generation box-sampling, apply) sees one uniform (3, H, W)
float32 layout, which is also the TPU-friendly layout (H=sublanes, W=lanes).

All functions are jax-traceable (work under jit on device) and also accept
numpy arrays for host-side use.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..errors import unsupported
from ..types import ColorRange, ImgFmt, RawImage


def _replicate_chroma(c, hf: int, vf: int):
    """Nearest-neighbor chroma upsample, matching getYuv4abPixel indexing."""
    if vf > 1:
        c = jnp.repeat(c, vf, axis=0)
    if hf > 1:
        c = jnp.repeat(c, hf, axis=1)
    return c


def unpack_yuv8(y, u, v, hf: int, vf: int, h: int, w: int):
    """8-bit planar YCbCr -> (3,H,W) float, 128-biased chroma
    (gainmapmath.cpp:354-388)."""
    yf = y.astype(jnp.float32) * (1.0 / 255.0)
    uf = (u.astype(jnp.float32) - 128.0) * (1.0 / 255.0)
    vf_ = (v.astype(jnp.float32) - 128.0) * (1.0 / 255.0)
    uf = _replicate_chroma(uf, hf, vf)[:h, :w]
    vf_ = _replicate_chroma(vf_, hf, vf)[:h, :w]
    return jnp.stack([yf[:h, :w], uf, vf_])


def unpack_p010(y, uv, rng: ColorRange, h: int, w: int):
    """P010 semiplanar -> (3,H,W) float (gainmapmath.cpp:425-448).

    y: (h, w) uint16 with data in 10 MSB; uv: (h/2, w) interleaved U,V.
    """
    y10 = jnp.right_shift(y.astype(jnp.uint16), 6).astype(jnp.float32)
    u10 = jnp.right_shift(uv[:, 0::2].astype(jnp.uint16), 6).astype(jnp.float32)
    v10 = jnp.right_shift(uv[:, 1::2].astype(jnp.uint16), 6).astype(jnp.float32)
    if rng == ColorRange.FULL:
        yf = y10 / 1023.0
        uf = u10 / 1023.0 - 0.5
        vf = v10 / 1023.0 - 0.5
    else:
        yf = (y10 - 64.0) * (1.0 / 876.0)
        uf = (u10 - 64.0) * (1.0 / 896.0) - 0.5
        vf = (v10 - 64.0) * (1.0 / 896.0) - 0.5
    uf = _replicate_chroma(uf, 2, 2)[:h, :w]
    vf = _replicate_chroma(vf, 2, 2)[:h, :w]
    return jnp.stack([yf[:h, :w], uf, vf])


def unpack_yuv444_10(y, u, v, rng: ColorRange):
    """30bpp YCbCr444 -> (3,H,W) float (gainmapmath.cpp:398-423)."""
    yf = y.astype(jnp.float32)
    uf = u.astype(jnp.float32)
    vf = v.astype(jnp.float32)
    if rng == ColorRange.FULL:
        return jnp.stack([yf / 1023.0, uf / 1023.0 - 0.5, vf / 1023.0 - 0.5])
    return jnp.stack([(yf - 64.0) * (1.0 / 876.0),
                      (uf - 64.0) * (1.0 / 896.0) - 0.5,
                      (vf - 64.0) * (1.0 / 896.0) - 0.5])


def unpack_rgba8888(packed):
    """uint32 (H,W) -> (3,H,W) float in [0,1] (gainmapmath.cpp:462-472).
    R bits 7:0, G 15:8, B 23:16."""
    p = packed.astype(jnp.uint32)
    r = jnp.bitwise_and(p, 0xFF).astype(jnp.float32)
    g = jnp.bitwise_and(jnp.right_shift(p, 8), 0xFF).astype(jnp.float32)
    b = jnp.bitwise_and(jnp.right_shift(p, 16), 0xFF).astype(jnp.float32)
    return jnp.stack([r, g, b]) / 255.0


def unpack_rgb888(arr):
    """uint8 (H,W,3) -> (3,H,W) float in [0,1] (gainmapmath.cpp:451-460)."""
    return jnp.moveaxis(arr.astype(jnp.float32), -1, 0) / 255.0


def unpack_rgba1010102(packed):
    """uint32 (H,W) -> (3,H,W) float in [0,1] (gainmapmath.cpp:474-484).
    R bits 9:0, G 19:10, B 29:20."""
    p = packed.astype(jnp.uint32)
    r = jnp.bitwise_and(p, 0x3FF).astype(jnp.float32)
    g = jnp.bitwise_and(jnp.right_shift(p, 10), 0x3FF).astype(jnp.float32)
    b = jnp.bitwise_and(jnp.right_shift(p, 20), 0x3FF).astype(jnp.float32)
    return jnp.stack([r, g, b]) / 1023.0


def unpack_rgbaf16(comp):
    """uint16 (H,W,4) [r,g,b,a] half-float bits -> (3,H,W) float32, sanitized
    (getRgbaF16Pixel, gainmapmath.cpp:486-495).

    The C API's packed-u64 layout maps to this via a host-side view cast
    (little-endian: r is the low 16 bits); JAX runs without x64 so device
    code never touches 64-bit integers.  float16 bitcast is identical to the
    reference's Skia-derived halfToFloat for all finite/inf/nan inputs."""
    comp = jnp.asarray(comp)
    rgb = jax.lax.bitcast_convert_type(
        comp[..., :3].astype(jnp.uint16), jnp.float16)
    rgb = jnp.moveaxis(rgb, -1, 0).astype(jnp.float32)
    from .colors import sanitize_pixel
    return sanitize_pixel(rgb)


def unpack(img: RawImage):
    """RawImage -> (3, H, W) float32 jnp array of YUV or RGB 'gamma' values.

    Dispatch analog of getPixelFn (gainmapmath.cpp:1221-1246)."""
    f = ImgFmt(img.fmt)
    h, w = img.h, img.w
    if f == ImgFmt.YUV444:
        return unpack_yuv8(jnp.asarray(img.planes[0]), jnp.asarray(img.planes[1]),
                           jnp.asarray(img.planes[2]), 1, 1, h, w)
    if f == ImgFmt.YUV422:
        return unpack_yuv8(jnp.asarray(img.planes[0]), jnp.asarray(img.planes[1]),
                           jnp.asarray(img.planes[2]), 2, 1, h, w)
    if f == ImgFmt.YUV420:
        return unpack_yuv8(jnp.asarray(img.planes[0]), jnp.asarray(img.planes[1]),
                           jnp.asarray(img.planes[2]), 2, 2, h, w)
    if f == ImgFmt.YUV400:
        y = jnp.asarray(img.planes[0]).astype(jnp.float32) * (1.0 / 255.0)
        z = jnp.zeros_like(y)
        return jnp.stack([y, z, z])
    if f == ImgFmt.P010:
        return unpack_p010(jnp.asarray(img.planes[0]), jnp.asarray(img.planes[1]),
                           ColorRange(img.range), h, w)
    if f == ImgFmt.YUV444_10:
        return unpack_yuv444_10(jnp.asarray(img.planes[0]), jnp.asarray(img.planes[1]),
                                jnp.asarray(img.planes[2]), ColorRange(img.range))
    if f == ImgFmt.RGBA8888:
        return unpack_rgba8888(jnp.asarray(img.planes[0]))
    if f == ImgFmt.RGB888:
        return unpack_rgb888(jnp.asarray(img.planes[0]))
    if f == ImgFmt.RGBA1010102:
        return unpack_rgba1010102(jnp.asarray(img.planes[0]))
    if f == ImgFmt.RGBAF16:
        return unpack_rgbaf16(jnp.asarray(img.planes[0]))
    raise unsupported(f"no unpack implementation for format {f}")


# ---------------------------------------------------------------------------
# Packing (PutPixelFn analogs, gainmapmath.cpp:540-607 + colorToRgba1010102/F16
# :1279-1289)

def _scale_u8(x):
    """ScaleTo8Bit (jpegr.cpp:1848-1852): round-half-up then clamp to
    [0,255] (std::round is half-away-from-zero; inputs are >= 0 here)."""
    return jnp.clip(jnp.floor(x * 255.0 + 0.5), 0.0, 255.0).astype(jnp.uint8)


def pack_rgba8888(rgb):
    """(3,H,W) float [0,1] -> uint32 (H,W), alpha=255
    (putRgba8888Pixel, gainmapmath.cpp:540-554: *255 +0.5 truncate)."""
    q = jnp.clip(rgb * 255.0 + 0.5, 0.0, 255.0).astype(jnp.uint32)
    return q[0] | jnp.left_shift(q[1], 8) | jnp.left_shift(q[2], 16) | jnp.uint32(255 << 24)


def pack_rgba1010102(rgb):
    """colorToRgba1010102 (gainmapmath.cpp:1279-1283): clip then round."""
    q = jnp.round(jnp.clip(rgb, 0.0, 1.0) * 1023.0).astype(jnp.uint32)
    return q[0] | jnp.left_shift(q[1], 10) | jnp.left_shift(q[2], 20) | jnp.uint32(0x3 << 30)


def pack_rgbaf16(rgb):
    """colorToRgbaF16 (gainmapmath.cpp:1285-1289): (3,H,W) f32 ->
    (H,W,4) uint16 half-float bits, alpha = half(1.0)."""
    h16 = jax.lax.bitcast_convert_type(rgb.astype(jnp.float16), jnp.uint16)
    a = jnp.full(rgb.shape[1:], 0x3C00, jnp.uint16)
    return jnp.stack([h16[0], h16[1], h16[2], a], axis=-1)


def pack_yuv420(yuv):
    """(3,H,W) gamma YUV (chroma centered at 0) -> (Y,U,V) uint8 planes with
    2x2 chroma averaging, mirroring the toneMap 420 store path
    (jpegr.cpp:2044-2071): Y per pixel, chroma averaged over the 2x2 quad
    after the +0.5 bias, all via ScaleTo8Bit (round-clamp)."""
    y = _scale_u8(yuv[0])
    h2, w2 = (yuv.shape[1] // 2) * 2, (yuv.shape[2] // 2) * 2
    u = yuv[1][:h2, :w2] + 0.5
    v = yuv[2][:h2, :w2] + 0.5
    u = u.reshape(h2 // 2, 2, w2 // 2, 2).mean(axis=(1, 3))
    v = v.reshape(h2 // 2, 2, w2 // 2, 2).mean(axis=(1, 3))
    return y, _scale_u8(u), _scale_u8(v)


def pack_yuv444(yuv, chroma_bias: float = 0.5):
    """(3,H,W) gamma YUV (chroma centered at 0) -> 3 uint8 planes.

    Mirrors toneMap's 444 store: sdr_yuv_gamma += (0,.5,.5) then
    putYuv444Pixel's *255 +0.5 truncate-clamp (jpegr.cpp:2047-2052,
    gainmapmath.cpp:578-600)."""
    y = jnp.clip(yuv[0] * 255.0 + 0.5, 0.0, 255.0).astype(jnp.uint8)
    u = jnp.clip((yuv[1] + chroma_bias) * 255.0 + 0.5, 0.0, 255.0).astype(jnp.uint8)
    v = jnp.clip((yuv[2] + chroma_bias) * 255.0 + 0.5, 0.0, 255.0).astype(jnp.uint8)
    return y, u, v


def box_downsample(x, k: int):
    """Box-average over k x k blocks: (…, H, W) -> (…, H//k, W//k).

    Matches samplePixels (gainmapmath.cpp:497-507): plain mean over the
    k x k window anchored at (x*k, y*k)."""
    if k == 1:
        return x
    h, w = x.shape[-2], x.shape[-1]
    mh, mw = h // k, w // k
    x = x[..., : mh * k, : mw * k]
    x = x.reshape(*x.shape[:-2], mh, k, mw, k)
    return x.mean(axis=(-3, -1))
