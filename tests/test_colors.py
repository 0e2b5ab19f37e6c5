"""Golden-value tests for the color math core.

Ports the numeric contract of /root/reference/tests/gainmapmath_test.cpp:
epsilons 1e-4 (pixels) / 1e-2 (luminance) (:26-27), primary YUV values
(:95-105), OETF/EOTF round trips, gamut matrix behavior.
"""

import numpy as np
import pytest

from libultrahdr_tpu.ops import colors

EPS = 1e-4
LUM_EPS = 1e-2


def col(r, g, b):
    return np.array([r, g, b], np.float32).reshape(3, 1, 1)


def flat(x):
    return np.asarray(x).reshape(3)


def sc(x):
    """Scalar from any size-1 array."""
    return float(np.asarray(x).reshape(-1)[0])


RGB_RED = col(1, 0, 0)
RGB_GREEN = col(0, 1, 0)
RGB_BLUE = col(0, 0, 1)
RGB_WHITE = col(1, 1, 1)
RGB_BLACK = col(0, 0, 0)


class TestLuminance:
    def test_srgb(self):
        # gainmapmath_test.cpp srgbLuminance goldens
        assert abs(sc(colors.srgb_luminance(RGB_BLACK)) - 0.0) < LUM_EPS
        assert abs(sc(colors.srgb_luminance(RGB_WHITE)) - 1.0) < LUM_EPS
        assert abs(sc(colors.srgb_luminance(RGB_RED)) - 0.212639) < LUM_EPS
        assert abs(sc(colors.srgb_luminance(RGB_GREEN)) - 0.715169) < LUM_EPS
        assert abs(sc(colors.srgb_luminance(RGB_BLUE)) - 0.072192) < LUM_EPS

    def test_p3(self):
        assert abs(sc(colors.p3_luminance(RGB_RED)) - 0.2289746) < LUM_EPS
        assert abs(sc(colors.p3_luminance(RGB_GREEN)) - 0.6917385) < LUM_EPS
        assert abs(sc(colors.p3_luminance(RGB_BLUE)) - 0.0792869) < LUM_EPS

    def test_bt2100(self):
        assert abs(sc(colors.bt2100_luminance(RGB_RED)) - 0.2627) < LUM_EPS
        assert abs(sc(colors.bt2100_luminance(RGB_GREEN)) - 0.677998) < LUM_EPS
        assert abs(sc(colors.bt2100_luminance(RGB_BLUE)) - 0.059302) < LUM_EPS


class TestRgbYuv:
    """Primary->YUV goldens from gainmapmath_test.cpp:95-105."""

    @pytest.mark.parametrize("matrix,red,green,blue", [
        (colors.SRGB_RGB2YUV,
         (0.2126, -0.11457, 0.5), (0.7152, -0.38543, -0.45415), (0.0722, 0.5, -0.04585)),
        (colors.P3_RGB2YUV,
         (0.299, -0.16874, 0.5), (0.587, -0.33126, -0.41869), (0.114, 0.5, -0.08131)),
        (colors.BT2100_RGB2YUV,
         (0.2627, -0.13963, 0.5), (0.6780, -0.36037, -0.45979), (0.0593, 0.5, -0.04021)),
    ])
    def test_primaries(self, matrix, red, green, blue):
        for rgb, want in [(RGB_RED, red), (RGB_GREEN, green), (RGB_BLUE, blue)]:
            got = flat(colors.rgb_to_yuv(rgb, matrix))
            np.testing.assert_allclose(got, want, atol=1e-3)

    @pytest.mark.parametrize("fwd,inv", [
        (colors.SRGB_RGB2YUV, colors.SRGB_YUV2RGB),
        (colors.P3_RGB2YUV, colors.P3_YUV2RGB),
        (colors.BT2100_RGB2YUV, colors.BT2100_YUV2RGB),
    ])
    def test_round_trip(self, fwd, inv):
        rng = np.random.default_rng(0)
        rgb = rng.random((3, 4, 5), np.float32)
        yuv = colors.rgb_to_yuv(rgb, fwd)
        back = colors.yuv_to_rgb(yuv, inv)
        np.testing.assert_allclose(np.asarray(back), rgb, atol=1e-3)  # YuvConversionEpsilon


class TestTransferFunctions:
    def test_srgb_points(self):
        # srgbInvOetf known points
        assert abs(sc(colors.srgb_inv_oetf(np.float32(0.0)))) < EPS
        assert abs(sc(colors.srgb_inv_oetf(np.float32(1.0))) - 1.0) < EPS
        # linear segment
        assert abs(sc(colors.srgb_inv_oetf(np.float32(0.02))) - 0.02 / 12.92) < EPS

    @pytest.mark.parametrize("oetf,inv", [
        (colors.srgb_oetf, colors.srgb_inv_oetf),
        (colors.hlg_oetf, colors.hlg_inv_oetf),
        (colors.pq_oetf, colors.pq_inv_oetf),
    ])
    def test_round_trips(self, oetf, inv):
        x = np.linspace(0.0, 1.0, 1001, dtype=np.float32)
        y = np.asarray(inv(np.asarray(oetf(x))))
        np.testing.assert_allclose(y, x, atol=EPS)

    def test_hlg_knee(self):
        # hlgOetf(1/12) = sqrt(3/12) = 0.5
        assert abs(sc(colors.hlg_oetf(np.float32(1.0 / 12.0))) - 0.5) < EPS

    def test_pq_anchors(self):
        # pqOetf(0)=0, pqOetf(1)=1
        assert abs(sc(colors.pq_oetf(np.float32(0.0)))) < EPS
        assert abs(sc(colors.pq_oetf(np.float32(1.0))) - 1.0) < EPS

    def test_hlg_ootf_white(self):
        # OOTF on unity white: luminance 1 -> scale 1
        out = flat(colors.hlg_ootf(RGB_WHITE, colors.K_BT2100))
        np.testing.assert_allclose(out, [1, 1, 1], atol=EPS)

    def test_hlg_ootf_inverse_round_trip(self):
        rng = np.random.default_rng(1)
        rgb = rng.random((3, 8, 8), np.float32) + 0.01
        fwd = colors.hlg_ootf(rgb, colors.K_BT2100)
        back = colors.hlg_inverse_ootf(np.asarray(fwd), colors.K_BT2100)
        np.testing.assert_allclose(np.asarray(back), rgb, atol=1e-3)


class TestGamut:
    def test_identity(self):
        from libultrahdr_tpu.types import ColorGamut
        m = colors.gamut_conversion_matrix(ColorGamut.BT709, ColorGamut.BT709)
        np.testing.assert_array_equal(m, np.eye(3, dtype=np.float32))

    def test_bt709_p3_round_trip(self):
        rng = np.random.default_rng(2)
        rgb = rng.random((3, 4, 4), np.float32)
        fwd = colors.convert_gamut(rgb, colors.BT709_TO_P3)
        back = colors.convert_gamut(np.asarray(fwd), colors.P3_TO_BT709)
        np.testing.assert_allclose(np.asarray(back), rgb, atol=1e-3)

    def test_bt2100_round_trips(self):
        rng = np.random.default_rng(3)
        rgb = rng.random((3, 4, 4), np.float32)
        for fwd_m, back_m in [(colors.BT709_TO_BT2100, colors.BT2100_TO_BT709),
                              (colors.P3_TO_BT2100, colors.BT2100_TO_P3)]:
            fwd = colors.convert_gamut(rgb, fwd_m)
            back = colors.convert_gamut(np.asarray(fwd), back_m)
            np.testing.assert_allclose(np.asarray(back), rgb, atol=1e-3)

    def test_white_preserved(self):
        # all gamut matrices map white to ~white (rows sum to 1)
        for m in [colors.BT709_TO_P3, colors.BT709_TO_BT2100, colors.P3_TO_BT709,
                  colors.P3_TO_BT2100, colors.BT2100_TO_BT709, colors.BT2100_TO_P3]:
            np.testing.assert_allclose(m.sum(axis=1), [1, 1, 1], atol=1e-4)


class TestYuvEncodingConversion:
    def test_identity_pairs(self):
        from libultrahdr_tpu.types import ColorGamut
        assert colors.yuv_encoding_conversion_matrix(ColorGamut.BT709, ColorGamut.BT709) is None

    def test_round_trip_709_601(self):
        rng = np.random.default_rng(4)
        yuv = rng.random((3, 4, 4), np.float32) - np.array([0, .5, .5], np.float32).reshape(3, 1, 1)
        fwd = colors.apply_3x3(colors.YUV_BT709_TO_BT601, yuv)
        back = colors.apply_3x3(colors.YUV_BT601_TO_BT709, np.asarray(fwd))
        np.testing.assert_allclose(np.asarray(back), yuv, atol=2e-3)


class TestSanitize:
    def test_sanitize_pixel(self):
        x = np.array([np.nan, np.inf, -np.inf], np.float32).reshape(3, 1, 1)
        out = flat(colors.sanitize_pixel(x))
        np.testing.assert_allclose(
            out, [0.0, colors.MAX_PIXEL_FLOAT_HDR_LINEAR, 0.0], atol=EPS)
