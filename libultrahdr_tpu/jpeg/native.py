"""Build + ctypes bindings for the native entropy codec.

Compiles jpeg_entropy.cpp with the system C++ compiler on first use
(UHDR_TPU_CXX, default g++; cached by source+compiler hash under
~/.cache/libultrahdr_tpu).  A pure-numpy fallback is intentionally absent:
the native toolchain is a hard dependency of this framework's runtime, like
libjpeg is for the reference.
"""

from __future__ import annotations

import ctypes
import hashlib
import os
import pathlib
import subprocess
import threading

import numpy as np

_SRCS = [pathlib.Path(__file__).parent / "_native" / "jpeg_entropy.cpp",
         pathlib.Path(__file__).parent / "_native" / "host_decode.cpp"]
_LOCK = threading.Lock()
_LIB = None


def cxx() -> str:
    """C++ compiler for the self-building natives (CI's clang configs set
    UHDR_TPU_CXX=clang++, cf. reference cmake_linux.yml clang rows)."""
    return os.environ.get("UHDR_TPU_CXX", "g++")


def _build() -> pathlib.Path:
    blob = b"".join(s.read_bytes() for s in _SRCS) + cxx().encode()
    tag = hashlib.sha256(blob).hexdigest()[:16]
    cache = pathlib.Path(os.environ.get(
        "UHDR_TPU_CACHE", os.path.expanduser("~/.cache/libultrahdr_tpu")))
    cache.mkdir(parents=True, exist_ok=True)
    # UHDR_TPU_SANITIZE=1 builds with ASan+UBSan (the reference's
    # UHDR_SANITIZE_OPTIONS analog, docs/building.md:70); the process must
    # LD_PRELOAD libasan — tools/sanitize_replay.py arranges that.
    sanitize = os.environ.get("UHDR_TPU_SANITIZE") == "1"
    so = cache / (f"jpeg_entropy_{tag}_asan.so" if sanitize
                  else f"jpeg_entropy_{tag}.so")
    if not so.exists():
        tmp = so.with_suffix(".so.tmp")
        flags = (["-O1", "-g", "-march=native",
                  "-fsanitize=address,undefined",
                  "-fno-sanitize-recover=all"] if sanitize
                 else ["-O3", "-march=native", "-fno-math-errno"])
        subprocess.run(
            [cxx(), *flags, "-shared", "-fPIC", "-std=c++17"]
            + [str(s) for s in _SRCS] + ["-o", str(tmp)],
            check=True, capture_output=True)
        os.replace(tmp, so)
    return so


def get_lib():
    global _LIB
    with _LOCK:
        if _LIB is None:
            lib = ctypes.CDLL(str(_build()))
            lib.uhdr_encode_scan.restype = ctypes.c_int64
            lib.uhdr_encode_scan.argtypes = [
                ctypes.POINTER(ctypes.c_void_p), ctypes.c_void_p,
                ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_int,
                ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p,
                ctypes.c_void_p, ctypes.c_void_p, ctypes.c_int64]
            lib.uhdr_pack_p010_10bit.restype = None
            lib.uhdr_pack_p010_10bit.argtypes = [
                ctypes.c_void_p, ctypes.c_int64, ctypes.c_void_p]
            lib.uhdr_pack_delta7.restype = ctypes.c_int64
            lib.uhdr_pack_delta7.argtypes = [
                ctypes.c_void_p, ctypes.c_int64, ctypes.c_int64,
                ctypes.c_int, ctypes.c_void_p, ctypes.c_void_p,
                ctypes.c_void_p, ctypes.c_int64]
            lib.uhdr_pack_delta.restype = ctypes.c_int64
            lib.uhdr_pack_delta.argtypes = [
                ctypes.c_void_p, ctypes.c_int64, ctypes.c_int64,
                ctypes.c_int, ctypes.c_int, ctypes.c_int,
                ctypes.c_void_p, ctypes.c_void_p,
                ctypes.c_void_p, ctypes.c_int64]
            lib.uhdr_pack_vw.restype = ctypes.c_int64
            lib.uhdr_pack_vw.argtypes = [
                ctypes.c_void_p, ctypes.c_int64, ctypes.c_int64,
                ctypes.c_int, ctypes.c_int, ctypes.c_int32,
                ctypes.c_void_p, ctypes.c_void_p, ctypes.c_int64]
            lib.uhdr_pack_slices.restype = ctypes.c_int64
            lib.uhdr_pack_slices.argtypes = [
                ctypes.c_void_p, ctypes.c_int64, ctypes.c_int,
                ctypes.c_void_p, ctypes.c_void_p,
                ctypes.c_void_p, ctypes.c_int64]
            lib.uhdr_pack_delta_g.restype = ctypes.c_int64
            lib.uhdr_pack_delta_g.argtypes = [
                ctypes.c_void_p, ctypes.c_int64, ctypes.c_int64,
                ctypes.c_int, ctypes.c_int, ctypes.c_int,
                ctypes.c_int, ctypes.c_int32, ctypes.c_void_p,
                ctypes.c_void_p, ctypes.c_void_p, ctypes.c_int64]
            lib.uhdr_stuff_scan.restype = ctypes.c_int64
            lib.uhdr_stuff_scan.argtypes = [
                ctypes.c_void_p, ctypes.c_void_p, ctypes.c_int,
                ctypes.c_void_p, ctypes.c_int64]
            lib.uhdr_stuff_scan_ranges.restype = ctypes.c_int64
            lib.uhdr_stuff_scan_ranges.argtypes = [
                ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p,
                ctypes.c_int, ctypes.c_void_p, ctypes.c_int64]
            lib.uhdr_join_blocks.restype = ctypes.c_int64
            lib.uhdr_join_blocks.argtypes = [
                ctypes.c_void_p, ctypes.c_void_p, ctypes.c_int64,
                ctypes.c_int64, ctypes.c_void_p, ctypes.c_int64]
            lib.uhdr_decode_progressive_scan.restype = ctypes.c_int64
            lib.uhdr_decode_progressive_scan.argtypes = [
                ctypes.c_void_p, ctypes.c_int64,
                ctypes.POINTER(ctypes.c_void_p), ctypes.c_void_p,
                ctypes.c_int, ctypes.c_void_p, ctypes.c_int,
                ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_int,
                ctypes.c_int, ctypes.c_int, ctypes.c_int,
                ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p,
                ctypes.c_void_p]
            lib.uhdr_decode_scan.restype = ctypes.c_int64
            lib.uhdr_decode_scan.argtypes = [
                ctypes.c_void_p, ctypes.c_int64,
                ctypes.POINTER(ctypes.c_void_p), ctypes.c_void_p,
                ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_int,
                ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p,
                ctypes.c_void_p]
            lib.uhdr_idct_plane.restype = None
            lib.uhdr_idct_plane.argtypes = [
                ctypes.c_void_p, ctypes.c_int64, ctypes.c_int64,
                ctypes.c_void_p, ctypes.c_void_p, ctypes.c_int64]
            lib.uhdr_ycbcr_to_rgb888.restype = None
            lib.uhdr_ycbcr_to_rgb888.argtypes = [
                ctypes.c_void_p, ctypes.c_int64, ctypes.c_void_p,
                ctypes.c_void_p, ctypes.c_int64, ctypes.c_int64,
                ctypes.c_int64, ctypes.c_void_p]
            lib.uhdr_unpack_delta2d.restype = ctypes.c_int64
            lib.uhdr_unpack_delta2d.argtypes = [
                ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p,
                ctypes.c_int64, ctypes.c_int64, ctypes.c_int64,
                ctypes.c_int, ctypes.c_int32, ctypes.c_void_p]
            lib.uhdr_apply_gainmap_host.restype = ctypes.c_int
            lib.uhdr_apply_gainmap_host.argtypes = [
                ctypes.c_void_p, ctypes.c_int64, ctypes.c_void_p,
                ctypes.c_void_p, ctypes.c_int64, ctypes.c_int, ctypes.c_int,
                ctypes.c_int64, ctypes.c_int64, ctypes.c_void_p,
                ctypes.c_int, ctypes.c_int64, ctypes.c_int64, ctypes.c_int,
                ctypes.c_int, ctypes.c_void_p, ctypes.c_float, ctypes.c_int,
                ctypes.c_void_p, ctypes.c_int, ctypes.c_void_p]
            lib.uhdr_ycbcr_to_rgb_planar.restype = None
            lib.uhdr_ycbcr_to_rgb_planar.argtypes = [
                ctypes.c_void_p, ctypes.c_int64, ctypes.c_void_p,
                ctypes.c_void_p, ctypes.c_int64, ctypes.c_int64,
                ctypes.c_int64, ctypes.c_void_p, ctypes.c_void_p,
                ctypes.c_void_p]
            lib.uhdr_ycc_to_rgba32.restype = None
            lib.uhdr_ycc_to_rgba32.argtypes = [
                ctypes.c_void_p, ctypes.c_int64, ctypes.c_void_p,
                ctypes.c_void_p, ctypes.c_int64, ctypes.c_int64,
                ctypes.c_int64, ctypes.c_int64, ctypes.c_int64,
                ctypes.c_int, ctypes.c_void_p]
            lib.uhdr_extract_channel10.restype = None
            lib.uhdr_extract_channel10.argtypes = [
                ctypes.c_void_p, ctypes.c_int64, ctypes.c_int,
                ctypes.c_void_p]
            _LIB = lib
    return _LIB


def extract_channel10(plane_u32: np.ndarray, shift: int) -> np.ndarray:
    """((plane >> shift) & 1023) as u16, SIMD (RGBA1010102 channel split
    for the RGB upload wire)."""
    lib = get_lib()
    p = np.ascontiguousarray(plane_u32, np.uint32)
    out = np.empty(p.shape, np.uint16)
    lib.uhdr_extract_channel10(p.ctypes.data, p.size, shift,
                               out.ctypes.data)
    return out


_SAMPLING_CODE = {"444": 0, "420": 1, "422": 2, "440": 3, "411": 4,
                  "410": 5}


def ycc_to_rgba32(y: np.ndarray, cb: np.ndarray, cr: np.ndarray,
                  fmt_key: str, h: int, w: int) -> np.ndarray:
    """Fused libjpeg fancy upsample + jdcolor fixed point -> packed
    RGBA8888 (h, w) uint32 (bit-exact twin of decoder._ycc_to_rgb_np,
    SIMD'd in host_decode.cpp uhdr_ycc_to_rgba32)."""
    lib = get_lib()
    y = np.ascontiguousarray(y, np.uint8)
    cb = np.ascontiguousarray(cb, np.uint8)
    cr = np.ascontiguousarray(cr, np.uint8)
    ch_, cw_ = cb.shape
    out = np.empty((h, w), np.uint32)
    lib.uhdr_ycc_to_rgba32(
        y.ctypes.data, y.shape[1], cb.ctypes.data, cr.ctypes.data, cw_,
        cw_, ch_, w, h, _SAMPLING_CODE[fmt_key], out.ctypes.data)
    return out


def ycbcr_to_rgb_planar(y: np.ndarray, cb: np.ndarray,
                        cr: np.ndarray) -> np.ndarray:
    """Full-range Rec.601 (h, w) u8 YCbCr planes -> (3, h, w) u8 planar
    RGB (SIMD; the host decode engine keeps the multichannel gain map
    planar so the apply gathers straight from u8 rows)."""
    lib = get_lib()
    y = np.ascontiguousarray(y, np.uint8)
    cb = np.ascontiguousarray(cb, np.uint8)
    cr = np.ascontiguousarray(cr, np.uint8)
    h, w = y.shape
    out = np.empty((3, h, w), np.uint8)
    lib.uhdr_ycbcr_to_rgb_planar(
        y.ctypes.data, w, cb.ctypes.data, cr.ctypes.data, w, w, h,
        out[0].ctypes.data, out[1].ctypes.data, out[2].ctypes.data)
    return out


def ycbcr_to_rgb888(y: np.ndarray, cb: np.ndarray,
                    cr: np.ndarray) -> np.ndarray:
    """Full-range Rec.601 (h, w) u8 YCbCr planes -> (h, w, 3) u8 RGB
    (the RGB-coded multichannel gain map's color decode)."""
    lib = get_lib()
    y = np.ascontiguousarray(y, np.uint8)
    cb = np.ascontiguousarray(cb, np.uint8)
    cr = np.ascontiguousarray(cr, np.uint8)
    h, w = y.shape
    out = np.empty((h, w, 3), np.uint8)
    lib.uhdr_ycbcr_to_rgb888(y.ctypes.data, w, cb.ctypes.data,
                             cr.ctypes.data, w, w, h, out.ctypes.data)
    return out


def unpack_delta2d(words: np.ndarray, esc_idx: np.ndarray,
                   esc_val: np.ndarray, n_esc: int, rows: int, cols: int,
                   bits: int, base: int) -> np.ndarray:
    """Host half of the download wire: un-slice one channel's 2D-delta
    codes (device-packed by fused._pack_down_wire_*) into (rows, cols)
    u16 samples.  Escape indices must be ascending (jnp.nonzero order)."""
    lib = get_lib()
    w = np.ascontiguousarray(words, np.uint32)
    ei = np.ascontiguousarray(esc_idx, np.int32)
    ev = np.ascontiguousarray(esc_val, np.int32)
    out = np.empty((rows, cols), np.uint16)
    r = lib.uhdr_unpack_delta2d(w.ctypes.data, ei.ctypes.data,
                                ev.ctypes.data, int(n_esc), rows, cols,
                                int(bits), int(base), out.ctypes.data)
    if r < 0:
        raise ValueError(f"unpack_delta2d failed: {r}")
    return out


def idct_plane(coeffs: np.ndarray, qt_natural: np.ndarray) -> np.ndarray:
    """Host IDCT: (bh, bw, 64) int16 zigzag coeffs + natural-order quant
    table -> (bh*8, bw*8) uint8 plane (AAN float, host_decode.cpp)."""
    lib = get_lib()
    c = np.ascontiguousarray(coeffs, np.int16)
    q = np.ascontiguousarray(qt_natural, np.int32).reshape(64)
    bh, bw = c.shape[:2]
    out = np.empty((bh * 8, bw * 8), np.uint8)
    lib.uhdr_idct_plane(c.ctypes.data, bh, bw, q.ctypes.data,
                        out.ctypes.data, bw * 8)
    return out


def apply_gainmap_host(y: np.ndarray, u: np.ndarray, v: np.ndarray,
                       hf: int, vf: int, w: int, h: int,
                       gm: np.ndarray, k: int, meta15: np.ndarray,
                       weight: float, out_ct: int,
                       gamut_m: np.ndarray | None,
                       gamut_pre: bool,
                       gm_planar: bool = False) -> np.ndarray:
    """Fused host apply (host_decode.cpp uhdr_apply_gainmap_host).

    gm: (mh, mw) u8 single-channel, (mh, mw, 3) u8 interleaved, or
    (3, mh, mw) u8 planar.  Returns (h, w) uint32 packed RGBA1010102
    (out_ct 1/2) or (h, w) uint64 packed RGBAF16 (out_ct 0)."""
    lib = get_lib()
    yc = np.ascontiguousarray(y, np.uint8)
    uc = np.ascontiguousarray(u, np.uint8)
    vc = np.ascontiguousarray(v, np.uint8)
    gmc = np.ascontiguousarray(gm, np.uint8)
    ch = 3 if gmc.ndim == 3 else 1
    planar = bool(gm_planar)
    if planar:
        assert gmc.ndim == 3 and gmc.shape[0] == 3
    mh, mw = gmc.shape[1:3] if planar else gmc.shape[:2]
    m = np.ascontiguousarray(meta15, np.float32).reshape(15)
    gp = None
    if gamut_m is not None:
        gp = np.ascontiguousarray(gamut_m, np.float32).reshape(9)
    out = np.empty((h, w), np.uint64 if out_ct == 0 else np.uint32)
    rc = lib.uhdr_apply_gainmap_host(
        yc.ctypes.data, yc.shape[1], uc.ctypes.data, vc.ctypes.data,
        uc.shape[1], hf, vf, w, h, gmc.ctypes.data, ch, mw, mh, k,
        int(planar), m.ctypes.data, float(weight), int(out_ct),
        gp.ctypes.data if gp is not None else None, int(bool(gamut_pre)),
        out.ctypes.data)
    if rc != 0:
        raise RuntimeError(f"apply_gainmap_host failed: {rc}")
    return out


def _table_blobs(dc_tables, ac_tables):
    """Pack up to 4 HuffTables each into flat bits[4*16] / vals[4*256]."""
    dc_bits = np.zeros((4, 16), np.uint8)
    dc_vals = np.zeros((4, 256), np.uint8)
    ac_bits = np.zeros((4, 16), np.uint8)
    ac_vals = np.zeros((4, 256), np.uint8)
    for i, t in enumerate(dc_tables):
        if t is None:
            continue
        dc_bits[i] = np.asarray(t.bits, np.uint8)
        dc_vals[i, :len(t.values)] = np.asarray(t.values, np.uint8)
    for i, t in enumerate(ac_tables):
        if t is None:
            continue
        ac_bits[i] = np.asarray(t.bits, np.uint8)
        ac_vals[i, :len(t.values)] = np.asarray(t.values, np.uint8)
    return dc_bits, dc_vals, ac_bits, ac_vals


def encode_scan(comps, mcus_w: int, mcus_h: int, dc_tables, ac_tables,
                restart_interval: int = 0) -> bytes:
    """comps: list of dicts {coeffs: (bh, bw, 64) int16 C-contig,
    h, v, dc_tbl, ac_tbl}."""
    lib = get_lib()
    n = len(comps)
    arrs = [np.ascontiguousarray(c["coeffs"], np.int16) for c in comps]
    ptrs = (ctypes.c_void_p * n)(*[a.ctypes.data for a in arrs])
    meta = np.zeros((n, 6), np.int32)
    for i, c in enumerate(comps):
        bh, bw = arrs[i].shape[:2]
        meta[i] = [bw, bh, c["h"], c["v"], c["dc_tbl"], c["ac_tbl"]]
    dcb, dcv, acb, acv = _table_blobs(dc_tables, ac_tables)
    # worst case: every coefficient a max-length code; generous bound
    cap = sum(a.size for a in arrs) * 4 + 65536
    out = np.empty(cap, np.uint8)
    written = lib.uhdr_encode_scan(
        ptrs, meta.ctypes.data, n, mcus_w, mcus_h, restart_interval,
        dcb.ctypes.data, dcv.ctypes.data, acb.ctypes.data, acv.ctypes.data,
        out.ctypes.data, cap)
    if written < 0:
        raise RuntimeError(f"entropy encode failed: {written}")
    return out[:written].tobytes()


def pack_p010_10bit(arr: np.ndarray) -> np.ndarray:
    """Pack the 10 MSB-resident bits of a uint16 array into a dense 10-bit
    little-endian stream: (n,) u16 -> (ceil(n/16)*10,) u16."""
    lib = get_lib()
    flat = np.ascontiguousarray(arr, np.uint16).reshape(-1)
    n = flat.size
    pad = (-n) % 16
    if pad:
        flat = np.concatenate([flat, np.zeros(pad, np.uint16)])
    out = np.empty((flat.size // 16) * 10, np.uint16)
    lib.uhdr_pack_p010_10bit(flat.ctypes.data, flat.size, out.ctypes.data)
    return out


DELTA7_ESC_CAP = 65536


def pack_delta_into(plane: np.ndarray, uv_interleaved: bool,
                    words: np.ndarray, esc_idx: np.ndarray,
                    esc_val: np.ndarray, *, two_d: bool = False,
                    bits: int = 7) -> bool:
    """Delta + bit-sliced wire packing of a P010 plane (the upload codec;
    see uhdr_pack_delta in jpeg_entropy.cpp), written into caller-provided
    buffers (typically views into one coalesced wire buffer,
    fused.pack_delta_wire); the escape capacity is esc_idx's length.
    two_d removes the vertical delta first (photographic content then
    fits 4-5 bits/sample).  False when the escape list overflows (caller
    falls back to a wider wire)."""
    lib = get_lib()
    p = np.ascontiguousarray(plane, np.uint16)
    rows, cols = p.shape
    esc_idx[:] = np.int32(1 << 30)      # pad target: dropped by the scatter
    esc_val[:] = 0
    n_esc = lib.uhdr_pack_delta(p.ctypes.data, rows, cols,
                                int(bool(uv_interleaved)), int(bool(two_d)),
                                int(bits), words.ctypes.data,
                                esc_idx.ctypes.data, esc_val.ctypes.data,
                                esc_idx.size)
    return n_esc >= 0


def pack_delta7_into(plane: np.ndarray, uv_interleaved: bool,
                     words: np.ndarray, esc_idx: np.ndarray,
                     esc_val: np.ndarray) -> bool:
    """pack_delta_into at the 1D/7-bit default (the original delta7)."""
    return pack_delta_into(plane, uv_interleaved, words, esc_idx, esc_val)


def pack_delta_g_into(plane_u16: np.ndarray, words: np.ndarray,
                      esc_idx: np.ndarray, esc_val32: np.ndarray, *,
                      two_d: bool = True, bits: int = 5, shift: int = 0,
                      base: int = 512) -> bool:
    """General delta wire pack (uhdr_pack_delta_g): raw u16 samples
    (shift=0) or MSB-aligned 10-bit (shift=6), int32 escape values (raw
    u16 2D deltas span 18 bits).  False on escape overflow."""
    lib = get_lib()
    p = np.ascontiguousarray(plane_u16, np.uint16)
    rows, cols = p.shape
    esc_idx[:] = np.int32(1 << 30)
    esc_val32[:] = 0
    n = lib.uhdr_pack_delta_g(p.ctypes.data, rows, cols, 0,
                              int(bool(two_d)), int(bits), int(shift),
                              int(base), words.ctypes.data,
                              esc_idx.ctypes.data, esc_val32.ctypes.data,
                              esc_idx.size)
    return n >= 0


def pack_vw_into(plane: np.ndarray, uv_interleaved: bool,
                 width_words: np.ndarray, payload: np.ndarray, *,
                 shift: int = 6, base: int = 512) -> int | None:
    """Variable-width group wire pack (uhdr_pack_vw): 2D-predicted
    residuals, each 32-sample group bit-sliced at its own exact width
    (0..12, packed 4 bits/group into width_words).  Always fits — no
    escape lists, no rung ladder.  Returns the payload word count (the
    live prefix of `payload`), or None only if payload is under-sized."""
    lib = get_lib()
    p = np.ascontiguousarray(plane, np.uint16)
    rows, cols = p.shape
    n = lib.uhdr_pack_vw(p.ctypes.data, rows, cols,
                         int(bool(uv_interleaved)), int(shift), int(base),
                         width_words.ctypes.data, payload.ctypes.data,
                         payload.size)
    return int(n) if n >= 0 else None


def pack_slices_into(flat_i16: np.ndarray, bits: int, words: np.ndarray,
                     esc_idx: np.ndarray, esc_val: np.ndarray) -> bool:
    """Bit-slice a flat int16 stream at `bits`/sample with escapes (the
    decode coefficient wire; uhdr_pack_slices).  Buffers are caller-owned
    views into one coalesced blob; escape capacity = esc_idx.size.  False
    when the escape list overflows."""
    lib = get_lib()
    a = np.ascontiguousarray(flat_i16, np.int16)
    esc_idx[:] = np.int32(1 << 30)
    esc_val[:] = 0
    n = lib.uhdr_pack_slices(a.ctypes.data, a.size, int(bits),
                             words.ctypes.data, esc_idx.ctypes.data,
                             esc_val.ctypes.data, esc_idx.size)
    return n >= 0


def pack_delta7(plane: np.ndarray, uv_interleaved: bool, *,
                two_d: bool = False, bits: int = 7):
    """Standalone variant of pack_delta_into: returns (words (n32,bits)
    u32, esc_idx (CAP,) i32, esc_val (CAP,) i16) or None on overflow."""
    rows, cols = plane.shape
    n32 = -(-(rows * cols) // 32)
    words = np.empty((n32, bits), np.uint32)
    esc_idx = np.empty(DELTA7_ESC_CAP, np.int32)
    esc_val = np.empty(DELTA7_ESC_CAP, np.int16)
    if not pack_delta_into(plane, uv_interleaved, words, esc_idx, esc_val,
                           two_d=two_d, bits=bits):
        return None
    return words, esc_idx, esc_val


def stuff_scan(row_bytes: np.ndarray, row_offsets: np.ndarray) -> bytes:
    """Byte-stuff device-packed restart rows and join them with RST markers
    (the final host pass after jpeg/device_entropy.py)."""
    lib = get_lib()
    rb = np.ascontiguousarray(row_bytes, np.uint8)
    off = np.ascontiguousarray(row_offsets, np.int32)
    n_rows = len(off) - 1
    cap = int(off[-1]) * 2 + 2 * n_rows + 16
    out = np.empty(cap, np.uint8)
    written = lib.uhdr_stuff_scan(rb.ctypes.data, off.ctypes.data, n_rows,
                                  out.ctypes.data, cap)
    if written < 0:
        raise RuntimeError(f"stuff_scan failed: {written}")
    return out[:written].tobytes()


def stuff_scan_ranges(buf: np.ndarray, starts: np.ndarray,
                      ends: np.ndarray) -> bytes:
    """Byte-stuff + RST-join restart rows given independent byte ranges
    (sharded encode assembly)."""
    lib = get_lib()
    b = np.ascontiguousarray(buf, np.uint8)
    s = np.ascontiguousarray(starts, np.int64)
    e = np.ascontiguousarray(ends, np.int64)
    n_rows = s.size
    total = int((e - s).sum())
    cap = total * 2 + 2 * n_rows + 16
    out = np.empty(cap, np.uint8)
    written = lib.uhdr_stuff_scan_ranges(b.ctypes.data, s.ctypes.data,
                                         e.ctypes.data, n_rows,
                                         out.ctypes.data, cap)
    if written < 0:
        raise RuntimeError(f"stuff_scan_ranges failed: {written}")
    return out[:written].tobytes()


def join_blocks(words: np.ndarray, len_bits: np.ndarray,
                blocks_per_row: int) -> bytes:
    """Bit-join word-aligned per-block segments (device packer v2) into the
    final scan: concatenation + RST per MCU row + byte stuffing."""
    lib = get_lib()
    w = np.ascontiguousarray(words, np.uint32)
    lb = np.ascontiguousarray(len_bits, np.uint16)
    total_bits = int(lb.astype(np.int64).sum())
    cap = total_bits // 4 + 2 * (lb.size // max(blocks_per_row, 1)) + 64
    out = np.empty(cap, np.uint8)
    written = lib.uhdr_join_blocks(w.ctypes.data, lb.ctypes.data,
                                   lb.size, blocks_per_row,
                                   out.ctypes.data, cap)
    if written < 0:
        raise RuntimeError(f"join_blocks failed: {written}")
    return out[:written].tobytes()


def decode_progressive_scan(data: bytes, coeff_arrays, comps, scan_comps,
                            ss: int, se: int, ah: int, al: int,
                            mcus_w: int, mcus_h: int, restart_interval: int,
                            dc_tables, ac_tables):
    """One progressive SOS (T.81 G.2); mutates coeff_arrays in place.

    comps: per image component dicts {h, v} (arrays are MCU padded);
    scan_comps: [(comp_index, dc_tbl, ac_tbl, sbw, sbh), ...]."""
    lib = get_lib()
    # only the tables the scan uses must exist (jdphuff.c start_pass:
    # DC-first needs DC tables, AC scans the AC table, DC refine none)
    for sc in scan_comps:
        if ss == 0 and ah == 0:
            _require_table(dc_tables, sc[1], "DC")
        elif ss > 0:
            _require_table(ac_tables, sc[2], "AC")
    n = len(coeff_arrays)
    ptrs = (ctypes.c_void_p * n)(*[a.ctypes.data for a in coeff_arrays])
    meta = np.zeros((n, 6), np.int32)
    for i, c in enumerate(comps):
        bh, bw = coeff_arrays[i].shape[:2]
        meta[i] = [bw, bh, c["h"], c["v"], 0, 0]
    smeta = np.asarray(scan_comps, np.int32).reshape(-1, 5)
    dcb, dcv, acb, acv = _table_blobs(dc_tables, ac_tables)
    buf = np.frombuffer(data, np.uint8)
    rc = lib.uhdr_decode_progressive_scan(
        buf.ctypes.data, len(data), ptrs, meta.ctypes.data, n,
        smeta.ctypes.data, smeta.shape[0], ss, se, ah, al,
        mcus_w, mcus_h, restart_interval,
        dcb.ctypes.data, dcv.ctypes.data, acb.ctypes.data, acv.ctypes.data)
    if rc < 0:
        from ..errors import UhdrError, UhdrErrorCode
        raise UhdrError(UhdrErrorCode.UHDR_CODEC_ERROR,
                        f"progressive scan decode failed: {rc}")


def _require_table(tables, idx: int, kind: str):
    """libjpeg parity: a scan referencing an absent or out-of-range table
    is rejected (jdhuff.c jpeg_make_d_derived_tbl, JERR_NO_HUFF_TABLE)."""
    if not (0 <= idx <= 3) or tables[idx] is None:
        from ..errors import UhdrError, UhdrErrorCode
        raise UhdrError(UhdrErrorCode.UHDR_CODEC_ERROR,
                        f"scan references missing {kind} huffman table "
                        f"{idx}")


def decode_scan(data: bytes, comps, mcus_w: int, mcus_h: int, dc_tables,
                ac_tables, restart_interval: int = 0):
    """Returns list of (bh, bw, 64) int16 coefficient arrays (MCU-padded)."""
    lib = get_lib()
    for c in comps:
        _require_table(dc_tables, c["dc_tbl"], "DC")
        _require_table(ac_tables, c["ac_tbl"], "AC")
    n = len(comps)
    outs = []
    for c in comps:
        bh = mcus_h * c["v"]
        bw = mcus_w * c["h"]
        outs.append(np.zeros((bh, bw, 64), np.int16))
    ptrs = (ctypes.c_void_p * n)(*[a.ctypes.data for a in outs])
    meta = np.zeros((n, 6), np.int32)
    for i, c in enumerate(comps):
        meta[i] = [outs[i].shape[1], outs[i].shape[0], c["h"], c["v"],
                   c["dc_tbl"], c["ac_tbl"]]
    dcb, dcv, acb, acv = _table_blobs(dc_tables, ac_tables)
    buf = np.frombuffer(data, np.uint8)
    consumed = lib.uhdr_decode_scan(
        buf.ctypes.data, len(data), ptrs, meta.ctypes.data, n,
        mcus_w, mcus_h, restart_interval,
        dcb.ctypes.data, dcv.ctypes.data, acb.ctypes.data, acv.ctypes.data)
    if consumed < 0:
        from ..errors import UhdrError, UhdrErrorCode
        raise UhdrError(UhdrErrorCode.UHDR_CODEC_ERROR,
                        f"entropy decode failed: {consumed}")
    return outs, int(consumed)
