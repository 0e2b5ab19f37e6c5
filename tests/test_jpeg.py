"""JPEG codec tests: self round trips + libjpeg (PIL) interop oracle.

Mirrors the coverage of /root/reference/tests/jpegencoderhelper_test.cpp and
jpegdecoderhelper_test.cpp (compress/decompress per sampling format, marker
extraction), with PIL (libjpeg-turbo) standing in for the fixture files.
"""

import io

import numpy as np
import pytest
from PIL import Image

from libultrahdr_tpu.jpeg import JpegEncoder, decode_to_planes, decode_to_rgba, parse_jpeg
from libultrahdr_tpu.jpeg.dct import fdct8x8, idct8x8
from libultrahdr_tpu.types import ColorGamut, ColorRange, ColorTransfer, ImgFmt, RawImage


def psnr(a, b, peak=255.0):
    a = np.asarray(a, np.float64)
    b = np.asarray(b, np.float64)
    mse = np.mean((a - b) ** 2)
    if mse == 0:
        return np.inf
    return 10 * np.log10(peak * peak / mse)


def smooth_image(h, w, seed=0):
    """Smooth-ish natural-image stand-in (random lowpass)."""
    rng = np.random.default_rng(seed)
    small = rng.random((h // 8 + 2, w // 8 + 2)) * 255
    img = np.array(Image.fromarray(small.astype(np.uint8)).resize((w, h), Image.BILINEAR))
    return img.astype(np.uint8)


def make_yuv420(h, w, seed=0):
    y = smooth_image(h, w, seed)
    u = smooth_image(h // 2, w // 2, seed + 1)
    v = smooth_image(h // 2, w // 2, seed + 2)
    return RawImage(ImgFmt.YUV420, ColorGamut.DISPLAY_P3, ColorTransfer.SRGB,
                    ColorRange.FULL, w, h, [y, u, v])


class TestDct:
    def test_dct_round_trip(self):
        rng = np.random.default_rng(0)
        blocks = (rng.random((10, 8, 8)).astype(np.float32) - 0.5) * 255
        back = np.asarray(idct8x8(np.asarray(fdct8x8(blocks))))
        np.testing.assert_allclose(back, blocks, atol=1e-3)

    def test_dct_dc_term(self):
        blocks = np.full((1, 8, 8), 127.0, np.float32)
        coeffs = np.asarray(fdct8x8(blocks))
        assert coeffs[0, 0, 0] == pytest.approx(8 * 127.0, abs=1e-2)
        assert np.abs(coeffs[0]).sum() == pytest.approx(8 * 127.0, abs=1e-2)


class TestEncodeDecodeSelf:
    @pytest.mark.parametrize("dims", [(64, 64), (60, 50), (128, 96)])
    def test_yuv420_round_trip(self, dims):
        h, w = dims
        img = make_yuv420(h, w)
        data = JpegEncoder().compress(img, 90)
        planes, fmt = decode_to_planes(data)
        assert fmt == ImgFmt.YUV420
        assert planes[0].shape == (h, w)
        assert planes[1].shape == ((h + 1) // 2, (w + 1) // 2)
        assert psnr(planes[0], img.planes[0]) > 35
        assert psnr(planes[1], img.planes[1]) > 35

    def test_yuv400_round_trip(self):
        y = smooth_image(48, 64, 3)
        img = RawImage(ImgFmt.YUV400, ColorGamut.UNSPECIFIED,
                       ColorTransfer.UNSPECIFIED, ColorRange.FULL, 64, 48, [y])
        data = JpegEncoder().compress(img, 85)
        planes, fmt = decode_to_planes(data)
        assert fmt == ImgFmt.YUV400
        assert psnr(planes[0], y) > 35

    def test_rgb888_round_trip(self):
        h, w = 40, 56
        rgb = np.stack([smooth_image(h, w, s) for s in range(3)], axis=-1)
        img = RawImage(ImgFmt.RGB888, ColorGamut.BT2100, ColorTransfer.HLG,
                       ColorRange.FULL, w, h, [rgb])
        data = JpegEncoder().compress(img, 90, gainmap_comment=True)
        packed = decode_to_rgba(data)
        r = (packed & 0xFF).astype(np.uint8)
        assert psnr(r, rgb[..., 0]) > 30

    def test_yuv444_round_trip(self):
        h, w = 32, 32
        planes = [smooth_image(h, w, s) for s in range(3)]
        img = RawImage(ImgFmt.YUV444, ColorGamut.DISPLAY_P3, ColorTransfer.SRGB,
                       ColorRange.FULL, w, h, planes)
        data = JpegEncoder().compress(img, 95)
        out, fmt = decode_to_planes(data)
        assert fmt == ImgFmt.YUV444
        for got, want in zip(out, planes):
            assert psnr(got, want) > 40


class TestPilInterop:
    def test_pil_decodes_our_stream(self):
        h, w = 64, 80
        img = make_yuv420(h, w)
        data = JpegEncoder().compress(img, 90)
        pil = Image.open(io.BytesIO(data))
        pil.load()
        assert pil.size == (w, h)

    def test_pil_pixel_agreement(self):
        """PIL's RGB decode of our stream must match our RGB decode
        (both clip out-of-gamut chroma identically)."""
        h, w = 32, 40
        planes = [smooth_image(h, w, s + 10) for s in range(3)]
        img = RawImage(ImgFmt.YUV444, ColorGamut.DISPLAY_P3, ColorTransfer.SRGB,
                       ColorRange.FULL, w, h, planes)
        data = JpegEncoder().compress(img, 95)
        pil_rgb = np.array(Image.open(io.BytesIO(data)).convert("RGB"))
        packed = decode_to_rgba(data)
        ours = np.stack([(packed >> (8 * i)) & 0xFF for i in range(3)],
                        axis=-1).astype(np.uint8)
        assert psnr(ours, pil_rgb) > 45

    def test_we_decode_pil_stream(self):
        h, w = 48, 64
        rgb = np.stack([smooth_image(h, w, s + 20) for s in range(3)], axis=-1)
        buf = io.BytesIO()
        Image.fromarray(rgb, "RGB").save(buf, "JPEG", quality=90)
        data = buf.getvalue()
        packed = decode_to_rgba(data)
        ours = np.stack([(packed >> (8 * i)) & 0xFF for i in range(3)],
                        axis=-1).astype(np.uint8)
        pil_rgb = np.array(Image.open(io.BytesIO(data)).convert("RGB"))
        assert psnr(ours, pil_rgb) > 40

    def test_we_decode_pil_gray(self):
        y = smooth_image(40, 40, 30)
        buf = io.BytesIO()
        Image.fromarray(y, "L").save(buf, "JPEG", quality=85)
        planes, fmt = decode_to_planes(buf.getvalue())
        assert fmt == ImgFmt.YUV400
        pil_y = np.array(Image.open(buf).convert("L"))
        assert psnr(planes[0], pil_y) > 45


class TestMarkers:
    def test_icc_and_comment_markers(self):
        img = make_yuv420(32, 32)
        icc = b"ICC_PROFILE\x00\x01\x01" + b"\x00" * 50
        data = JpegEncoder().compress(img, 90, icc=icc, gainmap_comment=True)
        info = parse_jpeg(data)
        assert info.icc == icc
        assert b"GainMap Image" in data

    def test_exif_xmp_iso_extraction(self):
        from libultrahdr_tpu.jpeg.encoder import _segment
        img = make_yuv420(32, 32)
        exif = b"Exif\x00\x00MM\x00\x2a" + b"\x00" * 16
        xmp = b"http://ns.adobe.com/xap/1.0/\x00<x:xmpmeta/>"
        iso = b"urn:iso:std:iso:ts:21496:-1\x00\x00\x00" + b"\x01" * 8
        data = JpegEncoder().compress(
            img, 90, extra_app_segments=[
                _segment(0xE1, exif), _segment(0xE1, xmp), _segment(0xE2, iso)])
        info = parse_jpeg(data)
        assert info.exif == exif
        assert info.xmp == xmp
        assert info.iso == iso
        # exif payload offset points at the "Exif" signature in the stream
        assert data[info.exif_offset:info.exif_offset + 6] == b"Exif\x00\x00"
