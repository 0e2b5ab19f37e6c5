"""Public API layer tests: setter validation matrices, sailed-state
lifecycle, API selection, effects, probe getters.

Models the reference's invalid-argument matrices and E2E round trips
(/root/reference/tests/jpegr_test.cpp:387-1363)."""

import numpy as np
import pytest

from libultrahdr_tpu import (Codec, ColorGamut, ColorRange, ColorTransfer,
                             CompressedImage, GainMapMetadata, ImgFmt,
                             ImgLabel, MirrorDirection, RawImage, UhdrDecoder,
                             UhdrEncoder, UhdrError, UhdrErrorCode,
                             is_uhdr_image)

W, H = 128, 64


def _p010(w=W, h=H, ct=ColorTransfer.HLG, cg=ColorGamut.BT2100,
          rng=ColorRange.FULL):
    rs = np.random.RandomState(3)
    y = (rs.randint(0, 1024, (h, w)).astype(np.uint16) << 6)
    uv = (rs.randint(256, 768, (h // 2, w)).astype(np.uint16) << 6)
    return RawImage(ImgFmt.P010, cg, ct, rng, w, h, [y, uv])


def _yuv420(w=W, h=H):
    rs = np.random.RandomState(4)
    return RawImage(ImgFmt.YUV420, ColorGamut.DISPLAY_P3, ColorTransfer.SRGB,
                    ColorRange.FULL, w, h,
                    [rs.randint(0, 256, (h, w)).astype(np.uint8),
                     rs.randint(0, 256, (h // 2, w // 2)).astype(np.uint8),
                     rs.randint(0, 256, (h // 2, w // 2)).astype(np.uint8)])


def _code(excinfo):
    return excinfo.value.code


class TestEncoderValidation:
    def test_bad_hdr_format(self):
        enc = UhdrEncoder()
        img = _yuv420()
        with pytest.raises(UhdrError) as e:
            enc.set_raw_image(img, ImgLabel.HDR)
        assert _code(e) == UhdrErrorCode.UHDR_CODEC_INVALID_PARAM

    def test_bad_sdr_format(self):
        enc = UhdrEncoder()
        with pytest.raises(UhdrError):
            enc.set_raw_image(_p010(), ImgLabel.SDR)

    def test_bad_transfer_pairings(self):
        enc = UhdrEncoder()
        with pytest.raises(UhdrError):
            enc.set_raw_image(_p010(ct=ColorTransfer.LINEAR), ImgLabel.HDR)
        with pytest.raises(UhdrError):
            enc.set_raw_image(_p010(ct=ColorTransfer.SRGB), ImgLabel.HDR)

    def test_bad_gamut(self):
        enc = UhdrEncoder()
        with pytest.raises(UhdrError):
            enc.set_raw_image(_p010(cg=ColorGamut.UNSPECIFIED), ImgLabel.HDR)

    def test_odd_dims(self):
        enc = UhdrEncoder()
        img = _p010(126, 63)
        img.w, img.h = 127, 63
        with pytest.raises(UhdrError):
            enc.set_raw_image(img, ImgLabel.HDR)

    def test_too_small(self):
        enc = UhdrEncoder()
        with pytest.raises(UhdrError):
            enc.set_raw_image(_p010(4, 4), ImgLabel.HDR)

    def test_bad_range_for_yuv420(self):
        enc = UhdrEncoder()
        img = _yuv420()
        img.range = ColorRange.LIMITED
        with pytest.raises(UhdrError):
            enc.set_raw_image(img, ImgLabel.SDR)

    def test_dims_mismatch_between_intents(self):
        enc = UhdrEncoder()
        enc.set_raw_image(_p010(), ImgLabel.HDR)
        with pytest.raises(UhdrError):
            enc.set_raw_image(_yuv420(64, 32), ImgLabel.SDR)

    def test_quality_range(self):
        enc = UhdrEncoder()
        with pytest.raises(UhdrError):
            enc.set_quality(101, ImgLabel.BASE)
        with pytest.raises(UhdrError):
            enc.set_quality(-1, ImgLabel.GAIN_MAP)
        enc.set_quality(0, ImgLabel.BASE)
        enc.set_quality(100, ImgLabel.GAIN_MAP)

    def test_scale_factor_range(self):
        enc = UhdrEncoder()
        with pytest.raises(UhdrError):
            enc.set_gainmap_scale_factor(0)
        with pytest.raises(UhdrError):
            enc.set_gainmap_scale_factor(129)
        enc.set_gainmap_scale_factor(128)

    def test_gamma_positive(self):
        enc = UhdrEncoder()
        with pytest.raises(UhdrError):
            enc.set_gainmap_gamma(0.0)
        with pytest.raises(UhdrError):
            enc.set_gainmap_gamma(-1.0)
        enc.set_gainmap_gamma(1.571)

    def test_boost_ordering(self):
        enc = UhdrEncoder()
        with pytest.raises(UhdrError):
            enc.set_min_max_content_boost(4.0, 2.0)
        with pytest.raises(UhdrError):
            enc.set_min_max_content_boost(0.0, 2.0)
        enc.set_min_max_content_boost(1.0, 8.0)

    def test_target_brightness_range(self):
        enc = UhdrEncoder()
        with pytest.raises(UhdrError):
            enc.set_target_display_peak_brightness(100.0)
        with pytest.raises(UhdrError):
            enc.set_target_display_peak_brightness(20000.0)
        enc.set_target_display_peak_brightness(1000.0)

    def test_output_format(self):
        enc = UhdrEncoder()
        with pytest.raises(UhdrError) as e:
            enc.set_output_format(Codec.HEIF)
        assert _code(e) == UhdrErrorCode.UHDR_CODEC_UNSUPPORTED_FEATURE
        enc.set_output_format(Codec.JPG)

    def test_encode_without_resources(self):
        enc = UhdrEncoder()
        with pytest.raises(UhdrError) as e:
            enc.encode()
        assert _code(e) == UhdrErrorCode.UHDR_CODEC_INVALID_OPERATION

    def test_rotate_validation(self):
        enc = UhdrEncoder()
        with pytest.raises(UhdrError):
            enc.add_effect_rotate(45)
        enc.add_effect_rotate(270)


class TestEncoderLifecycle:
    def test_api0_encode_sails_and_resets(self):
        enc = UhdrEncoder()
        enc.set_raw_image(_p010(), ImgLabel.HDR)
        data = enc.encode()
        assert is_uhdr_image(data)
        assert enc.get_encoded_stream() == data
        # sailed: setters now fail, second encode returns same bytes
        with pytest.raises(UhdrError) as e:
            enc.set_quality(80, ImgLabel.BASE)
        assert _code(e) == UhdrErrorCode.UHDR_CODEC_INVALID_OPERATION
        assert enc.encode() == data
        enc.reset()
        assert enc.get_encoded_stream() is None
        enc.set_raw_image(_p010(), ImgLabel.HDR)
        assert is_uhdr_image(enc.encode())

    def test_api1_roundtrip(self):
        enc = UhdrEncoder()
        enc.set_raw_image(_p010(), ImgLabel.HDR)
        enc.set_raw_image(_yuv420(), ImgLabel.SDR)
        enc.set_gainmap_scale_factor(2)
        data = enc.encode()
        assert is_uhdr_image(data)

    def test_api4_passthrough(self):
        # build parts via API-0 first
        enc = UhdrEncoder()
        enc.set_raw_image(_p010(), ImgLabel.HDR)
        data = enc.encode()
        dec = UhdrDecoder()
        dec.set_image(data)
        dec.probe()
        base = dec.get_base_image()
        gm = dec.get_gainmap_image()
        md = dec.get_gainmap_metadata()

        enc2 = UhdrEncoder()
        enc2.set_compressed_image(
            CompressedImage(base, ColorGamut.DISPLAY_P3), ImgLabel.BASE)
        enc2.set_gainmap_image(CompressedImage(gm), md)
        out = enc2.encode()
        assert is_uhdr_image(out)
        dec2 = UhdrDecoder()
        dec2.set_image(out)
        dec2.probe()
        md2 = dec2.get_gainmap_metadata()
        np.testing.assert_allclose(md2.max_content_boost,
                                   md.max_content_boost, rtol=1e-4)

    def test_effects_rejected_with_compressed_intents(self):
        enc = UhdrEncoder()
        enc.set_raw_image(_p010(), ImgLabel.HDR)
        data = enc.encode()
        dec = UhdrDecoder()
        dec.set_image(data)
        dec.probe()
        enc2 = UhdrEncoder()
        enc2.set_compressed_image(
            CompressedImage(dec.get_base_image(), ColorGamut.DISPLAY_P3),
            ImgLabel.BASE)
        enc2.set_gainmap_image(CompressedImage(dec.get_gainmap_image()),
                               dec.get_gainmap_metadata())
        enc2.add_effect_rotate(90)
        with pytest.raises(UhdrError) as e:
            enc2.encode()
        assert _code(e) == UhdrErrorCode.UHDR_CODEC_INVALID_OPERATION

    def test_encoder_effects_applied(self):
        enc = UhdrEncoder()
        enc.set_raw_image(_p010(), ImgLabel.HDR)
        enc.add_effect_rotate(90)
        enc.add_effect_mirror(MirrorDirection.HORIZONTAL)
        data = enc.encode()
        dec = UhdrDecoder()
        dec.set_image(data)
        dec.probe()
        assert dec.get_image_width() == H   # rotated
        assert dec.get_image_height() == W

    def test_encoder_crop(self):
        enc = UhdrEncoder()
        enc.set_raw_image(_p010(), ImgLabel.HDR)
        enc.add_effect_crop(16, 80, 8, 40)
        data = enc.encode()
        dec = UhdrDecoder()
        dec.set_image(data)
        dec.probe()
        assert dec.get_image_width() == 64
        assert dec.get_image_height() == 32


class TestDecoder:
    @staticmethod
    def _encoded(scale=2, multichannel=False):
        enc = UhdrEncoder()
        enc.set_raw_image(_p010(), ImgLabel.HDR)
        enc.set_gainmap_scale_factor(scale)
        enc.set_using_multi_channel_gainmap(multichannel)
        return enc.encode()

    def test_probe_getters(self):
        data = self._encoded()
        dec = UhdrDecoder()
        dec.set_image(data)
        assert dec.get_image_width() == -1   # not probed yet
        dec.probe()
        assert dec.get_image_width() == W
        assert dec.get_image_height() == H
        assert dec.get_gainmap_width() == W // 2
        assert dec.get_gainmap_height() == H // 2
        assert dec.get_icc() is not None
        assert dec.get_base_image() is not None
        assert dec.get_gainmap_image() is not None
        md = dec.get_gainmap_metadata()
        assert md.hdr_capacity_max > 1.0

    def test_fmt_ct_pairing(self):
        data = self._encoded()
        for fmt, ct, ok in [
                (ImgFmt.RGBA1010102, ColorTransfer.HLG, True),
                (ImgFmt.RGBA1010102, ColorTransfer.PQ, True),
                (ImgFmt.RGBA1010102, ColorTransfer.SRGB, False),
                (ImgFmt.RGBAF16, ColorTransfer.LINEAR, True),
                (ImgFmt.RGBAF16, ColorTransfer.HLG, False),
                (ImgFmt.RGBA8888, ColorTransfer.SRGB, True),
                (ImgFmt.RGBA8888, ColorTransfer.LINEAR, False)]:
            dec = UhdrDecoder()
            dec.set_image(data)
            dec.set_out_img_format(fmt)
            dec.set_out_color_transfer(ct)
            if ok:
                img = dec.decode()
                assert img.w == W and img.h == H and ImgFmt(img.fmt) == fmt
            else:
                with pytest.raises(UhdrError) as e:
                    dec.decode()
                assert _code(e) == UhdrErrorCode.UHDR_CODEC_INVALID_PARAM

    def test_decode_not_uhdr(self):
        dec = UhdrDecoder()
        dec.set_image(b"\xff\xd8\xff\xd9garbage")
        with pytest.raises(UhdrError):
            dec.decode()

    def test_max_display_boost_validation(self):
        dec = UhdrDecoder()
        with pytest.raises(UhdrError):
            dec.set_out_max_display_boost(0.5)
        dec.set_out_max_display_boost(1.0)

    def test_decoder_effects(self):
        data = self._encoded()
        dec = UhdrDecoder()
        dec.set_image(data)
        dec.set_out_img_format(ImgFmt.RGBA1010102)
        dec.set_out_color_transfer(ColorTransfer.HLG)
        dec.add_effect_rotate(90)
        img = dec.decode()
        assert (img.w, img.h) == (H, W)
        gm = dec.get_decoded_gainmap_image()
        assert (gm.w, gm.h) == (H // 2, W // 2)

    def test_decoder_crop_scales_gainmap(self):
        data = self._encoded()
        dec = UhdrDecoder()
        dec.set_image(data)
        dec.set_out_img_format(ImgFmt.RGBA8888)
        dec.set_out_color_transfer(ColorTransfer.SRGB)
        dec.add_effect_crop(16, 80, 8, 40)
        img = dec.decode()
        assert (img.w, img.h) == (64, 32)
        gm = dec.get_decoded_gainmap_image()
        assert (gm.w, gm.h) == (32, 16)

    def test_decoder_resize(self):
        data = self._encoded()
        dec = UhdrDecoder()
        dec.set_image(data)
        dec.set_out_img_format(ImgFmt.RGBAF16)
        dec.set_out_color_transfer(ColorTransfer.LINEAR)
        dec.add_effect_resize(64, 32)
        img = dec.decode()
        assert (img.w, img.h) == (64, 32)

    def test_sailed_and_reset(self):
        data = self._encoded()
        dec = UhdrDecoder()
        dec.set_image(data)
        dec.set_out_img_format(ImgFmt.RGBA8888)
        dec.set_out_color_transfer(ColorTransfer.SRGB)
        img = dec.decode()
        with pytest.raises(UhdrError):
            dec.set_out_color_transfer(ColorTransfer.HLG)
        assert dec.decode() is img
        dec.reset()
        assert dec.get_decoded_image() is None


def test_metadata_validation():
    from libultrahdr_tpu import validate_gainmap_metadata
    md = GainMapMetadata()
    md.min_content_boost[:] = 1.0
    md.max_content_boost[:] = 4.0
    md.hdr_capacity_min, md.hdr_capacity_max = 1.0, 4.0
    validate_gainmap_metadata(md)
    bad = GainMapMetadata()
    bad.min_content_boost[:] = 2.0
    bad.max_content_boost[:] = 1.0
    with pytest.raises(UhdrError):
        validate_gainmap_metadata(bad)
