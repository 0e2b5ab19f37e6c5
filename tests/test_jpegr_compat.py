"""Legacy pre-1.0 API surface (jpegr_compat) tests.

Anchors: the reference's legacy adapter (/root/reference/lib/src/jpegr.cpp:
2092-2758) and its legacy-vs-new bit-identity test
(tests/jpegr_test.cpp:1537-1558).
"""

import numpy as np
import pytest

from libultrahdr_tpu import jpegr_compat as compat
from libultrahdr_tpu.jpegr import JpegR
from libultrahdr_tpu.types import (ColorGamut, ColorRange, ColorTransfer,
                                   EncPreset, ImgFmt, RawImage)

W, H = 64, 48


def _p010_arrays(seed=3):
    rng = np.random.default_rng(seed)
    y = (rng.integers(64, 940, (H, W), np.uint16) << 6).astype(np.uint16)
    uv = (rng.integers(64, 960, (H // 2, W), np.uint16) << 6).astype(np.uint16)
    return y, uv


def _legacy_p010(y, uv, luma_stride=0, separate_chroma=False):
    img = compat.JpegRUncompressed(
        width=W, height=H, color_gamut=compat.UltrahdrColorGamut.BT2100)
    ls = luma_stride or W
    if separate_chroma:
        ybuf = np.zeros(ls * H, np.uint16)
        ybuf.reshape(H, ls)[:, :W] = y
        cbuf = np.zeros(ls * (H // 2), np.uint16)
        cbuf.reshape(H // 2, ls)[:, :W] = uv
        img.data, img.chroma_data = ybuf, cbuf
        img.luma_stride = img.chroma_stride = ls
    else:
        buf = np.zeros(ls * H + ls * (H // 2), np.uint16)
        buf[:ls * H].reshape(H, ls)[:, :W] = y
        buf[ls * H:].reshape(H // 2, ls)[:, :W] = uv
        img.data = buf
        img.luma_stride = ls
    return img


# the legacy surface carries the reference's Android defaults
# (jpegr.h:28-43): map scale 4, map quality 85, single-channel, realtime
_ANDROID = dict(map_dimension_scale_factor=4, map_compress_quality=85,
                use_multi_channel_gainmap=False, gamma=1.0,
                preset=EncPreset.REALTIME)


def _new_api_blob(y, uv):
    hdr = RawImage(ImgFmt.P010, ColorGamut.BT2100, ColorTransfer.HLG,
                   ColorRange.LIMITED, W, H, [y, uv])
    return JpegR(**_ANDROID).encode_api0(hdr, quality=95)


def test_encode_api0_matches_new_api_bitexact():
    y, uv = _p010_arrays()
    dest = compat.JpegRCompressed(data=bytearray(1 << 20),
                                  max_length=1 << 20)
    st = compat.JpegRCompat().encode_api0(
        _legacy_p010(y, uv), compat.UltrahdrTransferFunction.HLG, dest)
    assert st == compat.Status.JPEGR_NO_ERROR
    assert bytes(dest.data[:dest.length]) == _new_api_blob(y, uv)


def test_encode_api0_stride_invariance():
    y, uv = _p010_arrays()
    base = _new_api_blob(y, uv)
    for kw in ({"luma_stride": W + 16},
               {"separate_chroma": True},
               {"luma_stride": W + 8, "separate_chroma": True}):
        dest = compat.JpegRCompressed(data=bytearray(1 << 20),
                                      max_length=1 << 20)
        st = compat.JpegRCompat().encode_api0(
            _legacy_p010(y, uv, **kw),
            compat.UltrahdrTransferFunction.HLG, dest)
        assert st == compat.Status.JPEGR_NO_ERROR, kw
        assert bytes(dest.data[:dest.length]) == base, kw


@pytest.mark.parametrize("mutate,want", [
    (lambda i: setattr(i, "data", None),
     compat.Status.ERROR_JPEGR_BAD_PTR),
    (lambda i: setattr(i, "width", W - 1),
     compat.Status.ERROR_JPEGR_UNSUPPORTED_WIDTH_HEIGHT),
    (lambda i: setattr(i, "width", 4),
     compat.Status.ERROR_JPEGR_UNSUPPORTED_WIDTH_HEIGHT),
    (lambda i: setattr(i, "color_gamut",
                       compat.UltrahdrColorGamut.UNSPECIFIED),
     compat.Status.ERROR_JPEGR_INVALID_COLORGAMUT),
    (lambda i: setattr(i, "luma_stride", W - 2),
     compat.Status.ERROR_JPEGR_INVALID_STRIDE),
])
def test_encode_api0_validation(mutate, want):
    y, uv = _p010_arrays()
    img = _legacy_p010(y, uv)
    mutate(img)
    dest = compat.JpegRCompressed(data=bytearray(1 << 20),
                                  max_length=1 << 20)
    st = compat.JpegRCompat().encode_api0(
        img, compat.UltrahdrTransferFunction.HLG, dest)
    assert st == want


def test_encode_api0_rejects_srgb_tf_and_tiny_dest():
    y, uv = _p010_arrays()
    dest = compat.JpegRCompressed(data=bytearray(1 << 20),
                                  max_length=1 << 20)
    st = compat.JpegRCompat().encode_api0(
        _legacy_p010(y, uv), compat.UltrahdrTransferFunction.SRGB, dest)
    assert st == compat.Status.ERROR_JPEGR_INVALID_TRANS_FUNC
    tiny = compat.JpegRCompressed(data=bytearray(16), max_length=16)
    st = compat.JpegRCompat().encode_api0(
        _legacy_p010(y, uv), compat.UltrahdrTransferFunction.HLG, tiny)
    assert st == compat.Status.ERROR_JPEGR_BUFFER_TOO_SMALL


def test_encode_api1_and_resolution_mismatch():
    y, uv = _p010_arrays()
    jr = JpegR(**_ANDROID)
    hdr = RawImage(ImgFmt.P010, ColorGamut.BT2100, ColorTransfer.HLG,
                   ColorRange.LIMITED, W, H, [y, uv])
    sdr = jr.tone_map(hdr)
    sdr420 = compat.JpegRUncompressed(
        width=W, height=H, color_gamut=compat.UltrahdrColorGamut.P3)
    buf = np.concatenate([p.reshape(-1) for p in sdr.planes])
    sdr420.data = buf
    dest = compat.JpegRCompressed(data=bytearray(1 << 20),
                                  max_length=1 << 20)
    st = compat.JpegRCompat().encode_api1(
        _legacy_p010(y, uv), sdr420, compat.UltrahdrTransferFunction.HLG,
        dest)
    assert st == compat.Status.JPEGR_NO_ERROR
    expect = jr.encode_api1(hdr, sdr, quality=95)
    assert bytes(dest.data[:dest.length]) == expect

    sdr420.width = W - 2
    st = compat.JpegRCompat().encode_api1(
        _legacy_p010(y, uv), sdr420, compat.UltrahdrTransferFunction.HLG,
        dest)
    assert st == compat.Status.ERROR_JPEGR_RESOLUTION_MISMATCH


def test_decode_and_info_roundtrip():
    y, uv = _p010_arrays()
    blob = _new_api_blob(y, uv)
    cj = compat.JpegRCompressed(data=bytearray(blob), length=len(blob),
                                max_length=len(blob))

    info = compat.JpegRInfo(primary_img_info=compat.JpegInfo(),
                            gainmap_img_info=compat.JpegInfo())
    st = compat.JpegRCompat().get_jpegr_info(cj, info)
    assert st == compat.Status.JPEGR_NO_ERROR
    assert (info.width, info.height) == (W, H)
    assert info.gainmap_img_info.width == W // 4  # Android default 1/4
    assert info.primary_img_info.iso_data or info.primary_img_info.xmp_data \
        or info.gainmap_img_info.iso_data or info.gainmap_img_info.xmp_data

    # HDR_HLG decode == new-API decode, plus metadata out
    dest = compat.JpegRUncompressed(data=np.zeros(W * H, np.uint32))
    md = compat.UltrahdrMetadata()
    st = compat.JpegRCompat().decode_jpegr(
        cj, dest, output_format=compat.UltrahdrOutputFormat.HDR_HLG,
        metadata=md)
    assert st == compat.Status.JPEGR_NO_ERROR
    assert (dest.width, dest.height) == (W, H)
    assert dest.pixel_format == ImgFmt.RGBA1010102
    ref_img = JpegR().decode(blob, output_ct=ColorTransfer.HLG)[0]
    np.testing.assert_array_equal(
        np.frombuffer(dest.data, np.uint32).reshape(H, W),
        np.asarray(ref_img.planes[0]))
    assert md.max_content_boost > 1.0
    assert md.hdr_capacity_max >= md.hdr_capacity_min

    # SDR output format
    dest8 = compat.JpegRUncompressed(data=np.zeros(W * H, np.uint32))
    st = compat.JpegRCompat().decode_jpegr(
        cj, dest8, output_format=compat.UltrahdrOutputFormat.SDR)
    assert st == compat.Status.JPEGR_NO_ERROR
    assert dest8.pixel_format == ImgFmt.RGBA8888

    # gainmap image out
    gm = compat.JpegRUncompressed(data=np.zeros((W // 4) * (H // 4) * 3,
                                                np.uint8))
    st = compat.JpegRCompat().decode_jpegr(
        cj, dest, output_format=compat.UltrahdrOutputFormat.HDR_HLG,
        gainmap_image=gm)
    assert st == compat.Status.JPEGR_NO_ERROR
    assert (gm.width, gm.height) == (W // 4, H // 4)


def test_decode_validation():
    y, uv = _p010_arrays()
    blob = _new_api_blob(y, uv)
    cj = compat.JpegRCompressed(data=bytearray(blob), length=len(blob),
                                max_length=len(blob))
    dest = compat.JpegRUncompressed(data=np.zeros(W * H, np.uint32))
    c = compat.JpegRCompat()
    assert c.decode_jpegr(cj, dest, max_display_boost=0.5) == \
        compat.Status.ERROR_JPEGR_INVALID_DISPLAY_BOOST
    assert c.decode_jpegr(cj, dest, output_format=-1) == \
        compat.Status.ERROR_JPEGR_INVALID_OUTPUT_FORMAT
    assert c.decode_jpegr(cj, compat.JpegRUncompressed()) == \
        compat.Status.ERROR_JPEGR_BAD_PTR
    small = compat.JpegRUncompressed(data=np.zeros(4, np.uint32))
    assert c.decode_jpegr(cj, small) == \
        compat.Status.ERROR_JPEGR_BUFFER_TOO_SMALL
    garbage = compat.JpegRCompressed(data=bytearray(b"nope"), length=4,
                                     max_length=4)
    assert c.decode_jpegr(garbage, dest) == \
        compat.Status.JPEGR_UNKNOWN_ERROR
