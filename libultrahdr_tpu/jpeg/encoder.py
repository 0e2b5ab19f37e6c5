"""Baseline JPEG encoder: TPU DCT/quant + host Huffman + header assembly.

Replaces JpegEncoderHelper (/root/reference/lib/src/jpegencoderhelper.cpp):
same stream shape — JFIF APP0, optional ICC APP2, optional gain-map COM
marker (jpegencoderhelper.cpp:204-211), Annex-K tables scaled by libjpeg's
quality rule, sampling factors per input format
(jpegencoderhelper.cpp:26-43), baseline sequential scan, default Huffman
tables (the reference never enables optimize_coding).

The heavy half (level shift, FDCT, quantize, zigzag) runs as one jit program
per plane on TPU; only the bitstream serialization runs on host C++.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from .. import __version__ as _lib_version
from ..errors import invalid_param, unsupported
from ..types import ImgFmt, RawImage
from . import native
from .dct import forward_plane
from .tables import (AC_CHROMA, AC_LUMA, DC_CHROMA, DC_LUMA, STD_CHROMA_QUANT,
                     STD_LUMA_QUANT, ZIGZAG_ORDER, scaled_quant_table)

_FMT_SAMPLING = {
    ImgFmt.YUV400: [(1, 1)],
    ImgFmt.YUV444: [(1, 1), (1, 1), (1, 1)],
    ImgFmt.YUV440: [(1, 2), (1, 1), (1, 1)],
    ImgFmt.YUV422: [(2, 1), (1, 1), (1, 1)],
    ImgFmt.YUV420: [(2, 2), (1, 1), (1, 1)],
    ImgFmt.YUV411: [(4, 1), (1, 1), (1, 1)],
    ImgFmt.YUV410: [(4, 2), (1, 1), (1, 1)],
    ImgFmt.RGB888: [(1, 1), (1, 1), (1, 1)],  # converted to YCbCr 444
}


def _u16(v: int) -> bytes:
    return bytes([(v >> 8) & 0xFF, v & 0xFF])


def _segment(marker: int, payload: bytes) -> bytes:
    return bytes([0xFF, marker]) + _u16(len(payload) + 2) + payload


def _jfif_app0() -> bytes:
    return _segment(0xE0, b"JFIF\x00" + bytes([1, 1, 0]) + _u16(1) + _u16(1)
                    + bytes([0, 0]))


def _dqt(tbl_natural: np.ndarray, table_id: int) -> bytes:
    zz = tbl_natural[ZIGZAG_ORDER]  # natural -> zigzag order
    return _segment(0xDB, bytes([table_id]) + bytes(int(x) for x in zz))


def _sof0(h: int, w: int, comps) -> bytes:
    payload = bytes([8]) + _u16(h) + _u16(w) + bytes([len(comps)])
    for cid, (hs, vs), qtbl in comps:
        payload += bytes([cid, (hs << 4) | vs, qtbl])
    return _segment(0xC0, payload)


def _dht(table, table_class: int, table_id: int) -> bytes:
    return _segment(0xC4, table.dht_payload(table_class, table_id))


def _sos(comps) -> bytes:
    payload = bytes([len(comps)])
    for cid, dc_tbl, ac_tbl in comps:
        payload += bytes([cid, (dc_tbl << 4) | ac_tbl])
    payload += bytes([0, 63, 0])
    return _segment(0xDA, payload)


@functools.partial(jax.jit, static_argnames=("ph", "pw"))
def _rgb_to_ycbcr_planes(rgb_u8, ph: int, pw: int):
    """libjpeg JCS_RGB->YCbCr full-range Rec.601 conversion (jccolor.c),
    rgb_u8: (H, W, 3)."""
    r = rgb_u8[..., 0].astype(jnp.float32)
    g = rgb_u8[..., 1].astype(jnp.float32)
    b = rgb_u8[..., 2].astype(jnp.float32)
    y = 0.299 * r + 0.587 * g + 0.114 * b
    cb = -0.168735892 * r - 0.331264108 * g + 0.5 * b + 128.0
    cr = 0.5 * r - 0.418687589 * g - 0.081312411 * b + 128.0
    out = []
    for p in (y, cb, cr):
        q = jnp.clip(jnp.round(p), 0.0, 255.0).astype(jnp.uint8)
        out.append(q)
    return out


def _pad_plane(plane: np.ndarray, ph: int, pw: int, is_chroma: bool) -> np.ndarray:
    """Edge-replicate pad to (ph, pw) (MCU-aligned plane dims)."""
    h, w = plane.shape
    if h == ph and w == pw:
        return plane
    return np.pad(plane, ((0, ph - h), (0, pw - w)), mode="edge")


def _dri(interval: int) -> bytes:
    return _segment(0xDD, _u16(interval))


def assemble_jpeg(h: int, w: int, sampling, qluma, qchroma, scan: bytes,
                  icc: bytes | None = None, gainmap_comment: bool = False,
                  extra_app_segments: list[bytes] | None = None,
                  dri: int = 0) -> bytes:
    """Assemble a full baseline JPEG around an entropy-coded scan.

    Shared by the host path (compress) and the fused device path
    (libultrahdr_tpu.fused), which packs the scan on TPU with one restart
    segment per MCU row."""
    n = len(sampling)
    out = bytearray()
    out += b"\xFF\xD8"
    out += _jfif_app0()
    if icc:
        out += _segment(0xE2, icc)
    if extra_app_segments:
        for seg in extra_app_segments:
            out += seg
    if gainmap_comment:
        comment = (f"Source: google libuhdr v{_lib_version}, "
                   f"Coder: libjpeg v80, Attrib: GainMap Image")
        out += _segment(0xFE, comment.encode("ascii"))
    out += _dqt(qluma, 0)
    if n > 1:
        out += _dqt(qchroma, 1)
    out += _sof0(h, w, [(i + 1, sampling[i], 0 if i == 0 else 1)
                        for i in range(n)])
    out += _dht(DC_LUMA, 0, 0)
    out += _dht(AC_LUMA, 1, 0)
    if n > 1:
        out += _dht(DC_CHROMA, 0, 1)
        out += _dht(AC_CHROMA, 1, 1)
    if dri:
        out += _dri(dri)
    out += _sos([(i + 1, 0 if i == 0 else 1, 0 if i == 0 else 1)
                 for i in range(n)])
    out += scan
    out += b"\xFF\xD9"
    return bytes(out)


class JpegEncoder:
    """Stateless baseline JPEG compressor for the formats the codec needs."""

    def compress(self, img: RawImage, quality: int, icc: bytes | None = None,
                 gainmap_comment: bool = False,
                 extra_app_segments: list[bytes] | None = None) -> bytes:
        fmt = ImgFmt(img.fmt)
        if fmt not in _FMT_SAMPLING:
            raise invalid_param(f"unrecognized input format for jpeg encode: {fmt}")
        if img.w > 65535 or img.h > 65535:
            raise invalid_param("image too large for jpeg")
        sampling = _FMT_SAMPLING[fmt]
        hmax = max(s[0] for s in sampling)
        vmax = max(s[1] for s in sampling)
        mcus_w = -(-img.w // (8 * hmax))
        mcus_h = -(-img.h // (8 * vmax))

        if fmt == ImgFmt.RGB888:
            planes = _rgb_to_ycbcr_planes(jnp.asarray(img.planes[0]), img.h, img.w)
            planes = [np.asarray(p) for p in planes]
        else:
            planes = [np.asarray(p) for p in img.planes]

        n = len(sampling)
        quality = int(quality)
        qluma = scaled_quant_table(STD_LUMA_QUANT, quality)
        qchroma = scaled_quant_table(STD_CHROMA_QUANT, quality)

        comps = []
        for i in range(n):
            hs, vs = sampling[i]
            pbw = mcus_w * hs            # blocks across (MCU padded)
            pbh = mcus_h * vs
            padded = _pad_plane(planes[i], pbh * 8, pbw * 8, i > 0)
            q = qluma if i == 0 else qchroma
            coeffs = np.asarray(forward_plane(jnp.asarray(padded), q))
            comps.append({"coeffs": coeffs, "h": hs, "v": vs,
                          "dc_tbl": 0 if i == 0 else 1,
                          "ac_tbl": 0 if i == 0 else 1})

        dc_tables = [DC_LUMA, DC_CHROMA if n > 1 else None, None, None]
        ac_tables = [AC_LUMA, AC_CHROMA if n > 1 else None, None, None]
        scan = native.encode_scan(comps, mcus_w, mcus_h, dc_tables, ac_tables)

        return assemble_jpeg(img.h, img.w, sampling, qluma, qchroma, scan,
                             icc=icc, gainmap_comment=gainmap_comment,
                             extra_app_segments=extra_app_segments)
