"""Container layer tests: MPF bytes, ISO 21496-1 round trip, XMP generate/
parse round trip, ICC write/read round trip, segment scanner.

Mirrors /root/reference/tests/gainmapmetadata_test.cpp (encode/decode round
trip), icchelper_test.cpp (write->readIccColorGamut per gamut), and the XMP
round-trip in jpegr_test.cpp:1402.
"""

import numpy as np
import pytest

from libultrahdr_tpu.container import icc, iso21496, jpegr_container, mpf, segments, xmp
from libultrahdr_tpu.types import ColorGamut, ColorTransfer, GainMapMetadata


def sample_metadata(multichannel=False):
    md = GainMapMetadata()
    if multichannel:
        md.max_content_boost[:] = [8.0, 7.5, 6.0]
        md.min_content_boost[:] = [0.5, 0.5, 0.6]
        md.gamma[:] = [1.0, 1.1, 1.2]
        md.offset_sdr[:] = [1 / 64.0, 1 / 64.0, 1 / 64.0]
        md.offset_hdr[:] = [1 / 64.0, 1 / 64.0, 1 / 64.0]
    else:
        md.max_content_boost[:] = 8.0
        md.min_content_boost[:] = 0.5
        md.gamma[:] = 1.0
        md.offset_sdr[:] = 1 / 64.0
        md.offset_hdr[:] = 1 / 64.0
    md.hdr_capacity_min = 1.0
    md.hdr_capacity_max = 8.0
    md.use_base_cg = True
    return md


class TestMpf:
    def test_size(self):
        assert mpf.calculate_mpf_size() == len(
            mpf.generate_mpf(1000, 0, 500, 900))

    def test_structure(self):
        data = mpf.generate_mpf(1000, 0, 500, 900)
        assert data.startswith(b"MPF\x00")
        assert data[4:8] == bytes([0x4D, 0x4D, 0x00, 0x2A])  # big endian
        # version tag value
        assert b"0100" in data
        # primary entry: attribute | sizes at fixed offsets
        import struct
        entries_off = len(data) - 32
        attr, size, off = struct.unpack_from(">III", data, entries_off)
        assert attr == 0x030000 and size == 1000 and off == 0
        attr2, size2, off2 = struct.unpack_from(">III", data, entries_off + 16)
        assert attr2 == 0 and size2 == 500 and off2 == 900


class TestIso21496:
    @pytest.mark.parametrize("multichannel", [False, True])
    def test_round_trip(self, multichannel):
        md = sample_metadata(multichannel)
        frac = iso21496.float_to_fraction(md)
        data = iso21496.encode_gainmap_metadata(frac)
        frac2 = iso21496.decode_gainmap_metadata(data)
        md2 = iso21496.fraction_to_float(frac2)
        np.testing.assert_allclose(md2.max_content_boost, md.max_content_boost, rtol=1e-5)
        np.testing.assert_allclose(md2.min_content_boost, md.min_content_boost, rtol=1e-5)
        np.testing.assert_allclose(md2.gamma, md.gamma, rtol=1e-5)
        np.testing.assert_allclose(md2.offset_sdr, md.offset_sdr, rtol=1e-5)
        np.testing.assert_allclose(md2.offset_hdr, md.offset_hdr, rtol=1e-5)
        assert md2.hdr_capacity_max == pytest.approx(md.hdr_capacity_max, rel=1e-5)
        assert md2.use_base_cg == md.use_base_cg

    def test_single_channel_encodes_compactly(self):
        md = sample_metadata(False)
        frac = iso21496.float_to_fraction(md)
        data = iso21496.encode_gainmap_metadata(frac)
        # single channel + common denominator impossible here (denoms differ),
        # but channel count must be 1 (flags bit 7 unset)
        assert (data[4] & 0x80) == 0

    def test_fraction_conversion(self):
        n, d = iso21496.float_to_unsigned_fraction(0.5)
        assert n / d == 0.5
        n, d = iso21496.float_to_signed_fraction(-1.0)
        assert n / d == -1.0
        n, d = iso21496.float_to_unsigned_fraction(1.0 / 3.0)
        assert abs(n / d - 1.0 / 3.0) < 1e-9

    def test_backward_direction_rejected(self):
        md = sample_metadata()
        frac = iso21496.float_to_fraction(md)
        frac.backward_direction = True
        from libultrahdr_tpu.errors import UhdrError
        with pytest.raises(UhdrError):
            iso21496.fraction_to_float(frac)


class TestXmp:
    def test_generate_parse_round_trip(self):
        md = sample_metadata()
        payload = (xmp.XMP_NAMESPACE.encode() + b"\x00"
                   + xmp.generate_xmp_for_secondary_image(md).encode())
        md2 = xmp.parse_xmp_metadata(payload)
        assert md2.max_content_boost[0] == pytest.approx(8.0, rel=1e-4)
        assert md2.min_content_boost[0] == pytest.approx(0.5, rel=1e-4)
        assert md2.hdr_capacity_max == pytest.approx(8.0, rel=1e-4)
        assert md2.offset_sdr[0] == pytest.approx(1 / 64.0, rel=1e-4)

    def test_primary_contains_item_length(self):
        md = sample_metadata()
        s = xmp.generate_xmp_for_primary_image(12345, md)
        assert 'Item:Length="12345"' in s
        assert 'Item:Semantic="GainMap"' in s
        assert 'Item:Semantic="Primary"' in s

    def test_formatting_matches_reference_style(self):
        md = sample_metadata()
        s = xmp.generate_xmp_for_secondary_image(md)
        assert s.startswith("<x:xmpmeta\n  xmlns:x=\"adobe:ns:meta/\"")
        assert 'hdrgm:GainMapMax="3"' in s
        assert 'hdrgm:BaseRenditionIsHDR="False"' in s

    def test_missing_required_raises(self):
        from libultrahdr_tpu.errors import UhdrError
        bad = (xmp.XMP_NAMESPACE.encode() + b"\x00"
               + b'<x:xmpmeta xmlns:hdrgm="http://ns.adobe.com/hdr-gain-map/1.0/" '
                 b'hdrgm:Version="1"/>')
        with pytest.raises(UhdrError):
            xmp.parse_xmp_metadata(bad)


class TestIcc:
    @pytest.mark.parametrize("gamut", [ColorGamut.BT709, ColorGamut.DISPLAY_P3,
                                       ColorGamut.BT2100])
    @pytest.mark.parametrize("tf", [ColorTransfer.SRGB, ColorTransfer.LINEAR,
                                    ColorTransfer.HLG, ColorTransfer.PQ])
    def test_write_read_round_trip(self, gamut, tf):
        blob = icc.write_icc_profile(tf, gamut)
        assert blob is not None
        assert blob.startswith(b"ICC_PROFILE\x00")
        assert icc.read_icc_color_gamut(blob) == gamut

    def test_profile_size_consistency(self):
        import struct
        blob = icc.write_icc_profile(ColorTransfer.SRGB, ColorGamut.BT709)
        size = struct.unpack_from(">I", blob, icc.ICC_IDENTIFIER_SIZE)[0]
        assert size == len(blob) - icc.ICC_IDENTIFIER_SIZE

    def test_unspecified_gamut(self):
        assert icc.write_icc_profile(ColorTransfer.SRGB, ColorGamut.UNSPECIFIED) is None
        assert icc.read_icc_color_gamut(b"junk") == ColorGamut.UNSPECIFIED


class TestContainerAssembly:
    def _fake_jpeg(self, seed, size=200):
        rng = np.random.default_rng(seed)
        body = rng.integers(0, 255, size, dtype=np.uint8)
        body[body == 0xFF] = 0xFE  # avoid accidental markers
        return b"\xFF\xD8" + body.tobytes() + b"\xFF\xD9"

    def test_append_and_scan(self):
        md = sample_metadata()
        primary = self._fake_jpeg(0)
        gainmap = self._fake_jpeg(1, 80)
        out = jpegr_container.append_gainmap(primary, gainmap, md)
        ranges = segments.scan_jpeg_images(out)
        assert len(ranges) == 2
        start, end = ranges[0]
        assert out[start:start + 2] == b"\xFF\xD8"
        # secondary range contains the ISO metadata APP2
        s2 = out[ranges[1][0]:ranges[1][1]]
        assert b"urn:iso:std:iso:ts:21496:-1\x00" in s2

    def test_mpf_offsets_point_at_secondary(self):
        md = sample_metadata()
        primary = self._fake_jpeg(2)
        gainmap = self._fake_jpeg(3, 64)
        out = jpegr_container.append_gainmap(primary, gainmap, md)
        # locate MPF APP2
        idx = out.find(b"MPF\x00")
        assert idx > 0
        import struct
        # MP entries live 50 bytes after sig per layout; find secondary entry
        entries_off = idx + mpf.calculate_mpf_size() - 32
        _, psize, _ = struct.unpack_from(">III", out, entries_off)
        _, ssize, soff = struct.unpack_from(">III", out, entries_off + 16)
        # offset is relative to end of MPF signature region (sig+4 bytes)
        secondary_abs = idx + 4 + soff
        assert out[secondary_abs:secondary_abs + 2] == b"\xFF\xD8"
        ranges = segments.scan_jpeg_images(out)
        assert secondary_abs == ranges[1][0]
        assert psize == ranges[0][1] - ranges[0][0]
        assert ssize == ranges[1][1] - ranges[1][0]

    def test_exif_included(self):
        md = sample_metadata()
        exif = b"Exif\x00\x00MM\x00\x2a" + b"\x00" * 10
        out = jpegr_container.append_gainmap(
            self._fake_jpeg(4), self._fake_jpeg(5, 64), md, exif=exif)
        assert exif in out

    def test_xmp_mode(self):
        md = sample_metadata()
        out = jpegr_container.append_gainmap(
            self._fake_jpeg(6), self._fake_jpeg(7, 64), md,
            write_iso=False, write_xmp=True)
        assert b"http://ns.adobe.com/xap/1.0/\x00" in out
        assert b"hdrgm:GainMapMax" in out


class TestAppleExif:
    def test_headroom_formula(self):
        """Build a minimal synthetic Apple MakerNote EXIF and check the
        stops formula (maker33 >= 1, maker48 > 0.01)."""
        from libultrahdr_tpu.container.exif_apple import (
            APPLE_MAKER_HEADER, get_exif_apple_headroom)
        import struct

        # TIFF big endian; IFD0 with one MakerNote tag
        tiff = bytearray()
        tiff += b"MM\x00\x2a" + struct.pack(">I", 8)
        # IFD0 at offset 8: 1 field
        ifd0 = struct.pack(">H", 1)
        makernote_offset = 8 + 2 + 12 + 4  # after ifd0
        ifd0 += struct.pack(">HHII", 0x927C, 7, 1, makernote_offset)
        ifd0 += struct.pack(">I", 0)  # next ifd
        tiff += ifd0
        # MakerNote: header + IFD with tags 33 and 48 (format 10 = srational)
        mk = bytearray(APPLE_MAKER_HEADER)
        ifd_off_in_tiff = makernote_offset + len(APPLE_MAKER_HEADER)
        # value area offsets are relative to (ifd_start - header size)
        # i.e. tagData + (tiff_header + ifd_offset - header_len)
        base = ifd_off_in_tiff - len(APPLE_MAKER_HEADER)
        nfields = 2
        ifd = struct.pack(">H", nfields)
        value_area = ifd_off_in_tiff + 2 + nfields * 12 + 4
        # tag 33 value at value_area, tag 48 at value_area+8 (rel to base)
        ifd += struct.pack(">HHII", 33, 10, 1, value_area - base)
        ifd += struct.pack(">HHII", 48, 10, 1, value_area - base + 8)
        ifd += struct.pack(">I", 0)
        mk += ifd
        mk += struct.pack(">iI", 2, 1)      # maker33 = 2.0
        mk += struct.pack(">iI", 1, 10)     # maker48 = 0.1
        tiff += mk
        exif = b"Exif\x00\x00" + bytes(tiff)
        headroom = get_exif_apple_headroom(exif)
        stops = -0.303 * 0.1 + 2.303
        assert headroom == pytest.approx(2.0 ** stops, rel=1e-6)
