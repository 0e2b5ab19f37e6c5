"""Cross-implementation interop: this library vs the reference libuhdr.so.

The PSNR gates SURVEY.md section 4 calls for: files encoded here must
decode in the reference with >=60 dB agreement against our own decode, and
vice versa.  Requires the reference shared library built at /tmp/refbuild
(see .claude/skills/verify/SKILL.md); skipped otherwise."""

import ctypes
import os

import numpy as np
import pytest

LIB = "/tmp/refbuild/libuhdr.so"

pytestmark = pytest.mark.skipif(not os.path.exists(LIB),
                                reason="reference libuhdr.so not built")

W, H = 320, 192


class _RawImage(ctypes.Structure):
    _fields_ = [("fmt", ctypes.c_int), ("cg", ctypes.c_int),
                ("ct", ctypes.c_int), ("range", ctypes.c_int),
                ("w", ctypes.c_uint), ("h", ctypes.c_uint),
                ("planes", ctypes.c_void_p * 3),
                ("stride", ctypes.c_uint * 3)]


class _Compressed(ctypes.Structure):
    _fields_ = [("data", ctypes.c_void_p), ("data_sz", ctypes.c_size_t),
                ("capacity", ctypes.c_size_t), ("cg", ctypes.c_int),
                ("ct", ctypes.c_int), ("range", ctypes.c_int)]


class _ErrorInfo(ctypes.Structure):
    _fields_ = [("error_code", ctypes.c_int), ("has_detail", ctypes.c_int),
                ("detail", ctypes.c_char * 256)]


@pytest.fixture(scope="module")
def ref():
    lib = ctypes.CDLL(LIB)
    lib.uhdr_create_encoder.restype = ctypes.c_void_p
    lib.uhdr_create_decoder.restype = ctypes.c_void_p
    lib.uhdr_enc_set_raw_image.restype = _ErrorInfo
    lib.uhdr_enc_set_raw_image.argtypes = [ctypes.c_void_p,
                                           ctypes.POINTER(_RawImage),
                                           ctypes.c_int]
    lib.uhdr_encode.restype = _ErrorInfo
    lib.uhdr_encode.argtypes = [ctypes.c_void_p]
    lib.uhdr_get_encoded_stream.restype = ctypes.POINTER(_Compressed)
    lib.uhdr_get_encoded_stream.argtypes = [ctypes.c_void_p]
    lib.uhdr_dec_set_image.restype = _ErrorInfo
    lib.uhdr_dec_set_image.argtypes = [ctypes.c_void_p,
                                       ctypes.POINTER(_Compressed)]
    lib.uhdr_dec_set_out_color_transfer.restype = _ErrorInfo
    lib.uhdr_dec_set_out_color_transfer.argtypes = [ctypes.c_void_p,
                                                    ctypes.c_int]
    lib.uhdr_dec_set_out_img_format.restype = _ErrorInfo
    lib.uhdr_dec_set_out_img_format.argtypes = [ctypes.c_void_p,
                                                ctypes.c_int]
    lib.uhdr_decode.restype = _ErrorInfo
    lib.uhdr_decode.argtypes = [ctypes.c_void_p]
    lib.uhdr_get_decoded_image.restype = ctypes.POINTER(_RawImage)
    lib.uhdr_get_decoded_image.argtypes = [ctypes.c_void_p]
    lib.uhdr_release_encoder.argtypes = [ctypes.c_void_p]
    lib.uhdr_release_decoder.argtypes = [ctypes.c_void_p]
    return lib


def _scene_p010():
    yy, xx = np.mgrid[0:H, 0:W].astype(np.float32)
    lum = np.clip(0.45 + 0.4 * np.sin(xx / 37.0) * np.cos(yy / 23.0)
                  + 0.3 * np.exp(-(((xx - 200) / 40.) ** 2
                                   + ((yy - 80) / 30.) ** 2)), 0, 1)
    y = (np.clip(lum * 1023, 0, 1023).astype(np.uint16) << 6)
    u = 0.5 + 0.2 * np.sin(xx[::2, :] / 41.0)
    uv = np.empty((H // 2, W), np.uint16)
    uv[:, 0::2] = (np.clip(u[:, 0::2] * 1023, 0, 1023).astype(np.uint16) << 6)
    uv[:, 1::2] = (np.clip((1 - u)[:, 1::2] * 1023, 0, 1023)
                   .astype(np.uint16) << 6)
    return y, uv


def _ref_encode_api0(lib, y, uv) -> bytes:
    enc = lib.uhdr_create_encoder()
    img = _RawImage()
    img.fmt, img.cg, img.ct, img.range = 0, 2, 1, 1  # p010 bt2100 hlg full
    img.w, img.h = W, H
    img.planes[0] = y.ctypes.data
    img.planes[1] = uv.ctypes.data
    img.stride[0] = img.stride[1] = W
    err = lib.uhdr_enc_set_raw_image(enc, ctypes.byref(img), 0)
    assert err.error_code == 0, err.detail
    err = lib.uhdr_encode(enc)
    assert err.error_code == 0, err.detail
    out = lib.uhdr_get_encoded_stream(enc).contents
    data = ctypes.string_at(out.data, out.data_sz)
    lib.uhdr_release_encoder(enc)
    return data


def _ref_decode_hlg(lib, data: bytes) -> np.ndarray:
    dec = lib.uhdr_create_decoder()
    buf = ctypes.create_string_buffer(data, len(data))
    comp = _Compressed(ctypes.cast(buf, ctypes.c_void_p), len(data),
                       len(data), -1, -1, -1)
    assert lib.uhdr_dec_set_image(dec, ctypes.byref(comp)).error_code == 0
    assert lib.uhdr_dec_set_out_color_transfer(dec, 1).error_code == 0
    assert lib.uhdr_dec_set_out_img_format(dec, 5).error_code == 0
    err = lib.uhdr_decode(dec)
    assert err.error_code == 0, err.detail
    img = lib.uhdr_get_decoded_image(dec).contents
    rows = []
    for r in range(img.h):
        rows.append(np.frombuffer(
            ctypes.string_at(img.planes[0] + 4 * img.stride[0] * r,
                             4 * img.w), np.uint32))
    out = np.stack(rows)
    lib.uhdr_release_decoder(dec)
    return out


def _psnr_1010102(a: np.ndarray, b: np.ndarray) -> float:
    mse = np.mean([np.mean((((a >> s) & 0x3FF).astype(np.float64)
                            - ((b >> s) & 0x3FF).astype(np.float64)) ** 2)
                   for s in (0, 10, 20)])
    return 10 * np.log10(1023.0 ** 2 / max(mse, 1e-12))


def test_ours_encodes_reference_decodes(ref):
    """Encode here (defaults), decode with reference + with ourselves:
    cross-decoder PSNR >= 60 dB."""
    from libultrahdr_tpu.jpegr import JpegR
    from libultrahdr_tpu.types import (ColorGamut, ColorRange, ColorTransfer,
                                       ImgFmt, RawImage)
    y, uv = _scene_p010()
    img = RawImage(ImgFmt.P010, ColorGamut.BT2100, ColorTransfer.HLG,
                   ColorRange.FULL, W, H, [y, uv])
    jr = JpegR(map_dimension_scale_factor=2,
               use_multi_channel_gainmap=False, preset=0)
    data = jr.encode_api0(img, quality=95)
    ref_px = _ref_decode_hlg(ref, data)
    ours_px = np.asarray(JpegR().decode(
        data, output_ct=ColorTransfer.HLG)[0].planes[0])
    psnr = _psnr_1010102(ours_px, ref_px)
    assert psnr >= 60.0, f"cross-decoder PSNR {psnr:.2f} dB"


def test_reference_encodes_ours_decodes(ref):
    """Encode with the reference, decode both ways: PSNR >= 60 dB."""
    from libultrahdr_tpu.jpegr import JpegR, is_uhdr_image
    from libultrahdr_tpu.types import ColorTransfer
    y, uv = _scene_p010()
    data = _ref_encode_api0(ref, y, uv)
    assert is_uhdr_image(data)
    ref_px = _ref_decode_hlg(ref, data)
    ours_px = np.asarray(JpegR().decode(
        data, output_ct=ColorTransfer.HLG)[0].planes[0])
    psnr = _psnr_1010102(ours_px, ref_px)
    assert psnr >= 60.0, f"cross-decoder PSNR {psnr:.2f} dB"
