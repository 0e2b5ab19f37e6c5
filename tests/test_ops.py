"""Tests for pixel packing, IDW upsampling, tonemap and gainmap pipelines.

IDW is validated against a direct scalar re-implementation of the reference
algorithm (sampleMap + ShepardsIDW, gainmapmath.cpp:39-80/923-956) used as an
in-test oracle.  Gain encode/apply are validated as a round trip, mirroring
gainmapmath_test.cpp's encodeGain/applyGain golden tests.
"""

import numpy as np
import pytest

from libultrahdr_tpu.ops import apply as apply_ops
from libultrahdr_tpu.ops import colors, gainmap, idw, pixel
from libultrahdr_tpu.types import ColorGamut, ColorRange, ColorTransfer, ImgFmt


class TestPixel:
    def test_rgba8888_round_trip(self):
        rng = np.random.default_rng(0)
        rgb = rng.random((3, 6, 8)).astype(np.float32)
        packed = np.asarray(pixel.pack_rgba8888(rgb))
        unpacked = np.asarray(pixel.unpack_rgba8888(packed))
        assert np.abs(unpacked - rgb).max() <= 0.5 / 255.0 + 1e-6

    def test_rgba1010102_round_trip(self):
        rng = np.random.default_rng(1)
        rgb = rng.random((3, 6, 8)).astype(np.float32)
        packed = np.asarray(pixel.pack_rgba1010102(rgb))
        unpacked = np.asarray(pixel.unpack_rgba1010102(packed))
        assert np.abs(unpacked - rgb).max() <= 0.5 / 1023.0 + 1e-6

    def test_rgbaf16_round_trip(self):
        rng = np.random.default_rng(2)
        rgb = (rng.random((3, 6, 8)) * 4.0).astype(np.float32)
        packed = np.asarray(pixel.pack_rgbaf16(rgb))
        assert packed.shape == (6, 8, 4) and packed.dtype == np.uint16
        unpacked = np.asarray(pixel.unpack_rgbaf16(packed))
        np.testing.assert_allclose(unpacked, rgb, rtol=1e-3)
        # alpha half bits must equal 1.0; u64 view matches C layout
        assert np.all(packed[..., 3] == 0x3C00)
        u64 = packed.reshape(6, 8, 4).view(np.uint64)[..., 0]
        assert np.all((u64 >> np.uint64(48)) == np.uint64(0x3C00))

    def test_p010_limited_range(self):
        # y=64 -> 0.0; y=940 -> 1.0 per narrow-range normalization
        h = w = 4
        y = np.full((h, w), 64 << 6, np.uint16)
        uv = np.full((h // 2, w), 512 << 6, np.uint16)
        out = np.asarray(pixel.unpack_p010(y, uv, ColorRange.LIMITED, h, w))
        np.testing.assert_allclose(out[0], 0.0, atol=1e-6)
        y2 = np.full((h, w), 940 << 6, np.uint16)
        out2 = np.asarray(pixel.unpack_p010(y2, uv, ColorRange.LIMITED, h, w))
        np.testing.assert_allclose(out2[0], 1.0, atol=1e-6)

    def test_yuv420_chroma_replication(self):
        y = np.arange(16, dtype=np.uint8).reshape(4, 4)
        u = np.array([[128, 129], [130, 131]], np.uint8)
        v = np.array([[127, 126], [125, 124]], np.uint8)
        out = np.asarray(pixel.unpack_yuv8(y, u, v, 2, 2, 4, 4))
        # (2,2) block of pixels shares the chroma sample at (1,1)
        assert out[1, 2, 2] == pytest.approx((131 - 128) / 255.0)
        assert out[1, 3, 3] == pytest.approx((131 - 128) / 255.0)

    def test_box_downsample(self):
        x = np.arange(16, dtype=np.float32).reshape(1, 4, 4)
        d = np.asarray(pixel.box_downsample(x, 2))
        np.testing.assert_allclose(d[0, 0, 0], np.mean([0, 1, 4, 5]))
        np.testing.assert_allclose(d[0, 1, 1], np.mean([10, 11, 14, 15]))


# --------------------------------------------------------------------------
# Scalar oracle: direct port of the reference integer-factor sampleMap.

def _fill_shepards(k, inc_r, inc_b):
    w = np.zeros((k, k, 4), np.float32)
    for y in range(k):
        for x in range(k):
            px, py = x / k, y / k
            nx, ny = inc_r, inc_b
            d1 = np.hypot(px, py)
            if d1 == 0:
                w[y, x] = [1, 0, 0, 0]
            else:
                ws = np.array([1 / d1, 1 / np.hypot(px - 0, py - ny),
                               1 / np.hypot(px - nx, py - 0),
                               1 / np.hypot(px - nx, py - ny)])
                w[y, x] = ws / ws.sum()
    return w


def _sample_map_oracle(m, k, x, y):
    mh, mw = m.shape
    xl, yl = min(x // k, mw - 1), min(y // k, mh - 1)
    xu, yu = min(xl + 1, mw - 1), min(yl + 1, mh - 1)
    e = [m[yl, xl], m[yu, xl], m[yl, xu], m[yu, xu]]
    if xl == xu and yl == yu:
        tab = _fill_shepards(k, 0, 0)
    elif xl == xu:
        tab = _fill_shepards(k, 0, 1)
    elif yl == yu:
        tab = _fill_shepards(k, 1, 0)
    else:
        tab = _fill_shepards(k, 1, 1)
    w = tab[y % k, x % k]
    return float(np.dot(e, w))


class TestIdw:
    @pytest.mark.parametrize("k", [1, 2, 4])
    def test_matches_scalar_oracle(self, k):
        rng = np.random.default_rng(3)
        mh, mw = 5, 7
        m = rng.random((mh, mw)).astype(np.float32)
        out_h, out_w = mh * k, mw * k
        got = np.asarray(idw.idw_upsample(m[None], k, out_h, out_w))[0]
        want = np.empty((out_h, out_w), np.float32)
        for y in range(out_h):
            for x in range(out_w):
                want[y, x] = _sample_map_oracle(m, k, x, y)
        np.testing.assert_allclose(got, want, atol=1e-5)

    def test_fractional_close_to_integer(self):
        rng = np.random.default_rng(4)
        m = rng.random((4, 4)).astype(np.float32)
        a = np.asarray(idw.idw_upsample(m[None], 2, 8, 8))
        b = np.asarray(idw.idw_upsample_fractional(m[None], 2.0, 8, 8))
        np.testing.assert_allclose(a, b, atol=1e-4)

    def test_3channel(self):
        rng = np.random.default_rng(5)
        m = rng.random((3, 4, 4)).astype(np.float32)
        out = np.asarray(idw.idw_upsample(m, 4, 16, 16))
        assert out.shape == (3, 16, 16)
        # map texel centers reproduce exactly
        np.testing.assert_allclose(out[:, ::4, ::4], m, atol=1e-6)


class TestGainEncodeApply:
    def test_encode_gain_extremes(self):
        # encodeGain goldens: sdr==hdr -> gain 1.0 -> norm position of log2(1)
        mn, mx, gamma = np.float32(1.0), np.float32(8.0), np.float32(1.0)
        g = np.asarray(gainmap.encode_gain(
            np.float32(100.0), np.float32(100.0), mn, mx, gamma))
        assert g == 0  # log2(1)=0 == log2min -> 0
        g2 = np.asarray(gainmap.encode_gain(
            np.float32(100.0), np.float32(800.0), mn, mx, gamma))
        assert g2 == 255
        g3 = np.asarray(gainmap.encode_gain(
            np.float32(0.0), np.float32(800.0), mn, mx, gamma))
        assert g3 == 0  # sdr<=0 -> gain 1.0

    def test_compute_gain_dark_cap(self):
        g = float(np.asarray(gainmap.compute_gain(np.float32(0.0), np.float32(500.0))))
        assert g == pytest.approx(2.3, abs=1e-5)
        g2 = float(np.asarray(gainmap.compute_gain(np.float32(100.0), np.float32(800.0))))
        assert g2 == pytest.approx(3.0, abs=1e-5)

    def test_affine_map_gain(self):
        v = np.asarray(gainmap.affine_map_gain(
            np.float32(0.0), np.float32(-1.0), np.float32(1.0), np.float32(1.0)))
        assert v == 128  # (0-(-1))/2*255+0.5 = 128.0 -> 128

    def test_encode_apply_round_trip(self):
        """encodeGain -> applyGain recovers the HDR/SDR ratio (the
        gainmapmath_test applyGain tests' contract)."""
        meta = {
            "gamma": np.ones(3, np.float32),
            "min_content_boost": np.ones(3, np.float32),
            "max_content_boost": np.full(3, 4.0, np.float32),
            "offset_sdr": np.zeros(3, np.float32),
            "offset_hdr": np.zeros(3, np.float32),
        }
        sdr_nits = np.full((1, 4, 4), 100.0, np.float32)
        hdr_nits = np.full((1, 4, 4), 300.0, np.float32)
        enc = np.asarray(gainmap.encode_gain(
            sdr_nits, hdr_nits, meta["min_content_boost"][0],
            meta["max_content_boost"][0], np.float32(1.0)))
        rgb_sdr = np.full((3, 4, 4), 0.5, np.float32)
        out = np.asarray(apply_ops.apply_gain(
            rgb_sdr, enc.astype(np.float32) / 255.0, meta, 1.0))
        np.testing.assert_allclose(out, 0.5 * 3.0, rtol=2e-2)


class TestTonemap:
    def test_reinhard(self):
        from libultrahdr_tpu.ops.tonemap import reinhard_map
        # ReinhardMap(headroom, headroom) == 1.0 (compresses peak to 1)
        assert float(np.asarray(reinhard_map(np.float32(4.0), 4.0))) == pytest.approx(
            (1 + 4 / 16) / (1 + 4) * 4, abs=1e-6)

    def test_black_maps_to_black_white_stays(self):
        from libultrahdr_tpu.ops.tonemap import global_tonemap_rgb
        rgb = np.zeros((3, 2, 2), np.float32)
        out, _, _ = global_tonemap_rgb(rgb, 1000 / 203.0, True)
        np.testing.assert_allclose(np.asarray(out), 0.0, atol=1e-6)

    def test_tonemap_p010_shape_and_range(self):
        from libultrahdr_tpu.ops.tonemap import tonemap_to_yuv
        h, w = 16, 24
        rng = np.random.default_rng(6)
        hdr = rng.random((3, h, w)).astype(np.float32)
        hdr[1:] -= 0.5  # chroma centered
        y, u, v = tonemap_to_yuv(hdr, ImgFmt.P010, ColorGamut.BT2100,
                                 ColorTransfer.HLG, out_yuv420=True)
        assert np.asarray(y).shape == (h, w)
        assert np.asarray(u).shape == (h // 2, w // 2)
        assert np.asarray(v).shape == (h // 2, w // 2)


class TestGainmapPipelines:
    def _inputs(self, h=32, w=32):
        rng = np.random.default_rng(7)
        sdr = rng.random((3, h, w)).astype(np.float32)
        sdr[1:] -= 0.5
        hdr = rng.random((3, h, w)).astype(np.float32)
        hdr[1:] -= 0.5
        return sdr, hdr

    def test_onepass_shapes(self):
        sdr, hdr = self._inputs()
        gm = gainmap.generate_gainmap_onepass(
            sdr, hdr, sdr_fmt=ImgFmt.YUV420, hdr_fmt=ImgFmt.P010,
            sdr_cg=ColorGamut.DISPLAY_P3, hdr_cg=ColorGamut.BT2100,
            ct=ColorTransfer.HLG, scale=4, multichannel=False, gamma=1.0,
            use_luminance=False, sdr_is_601=True, use_base_cg=False,
            max_boost=1000.0 / 203.0)
        assert np.asarray(gm).shape == (1, 8, 8)
        assert np.asarray(gm).dtype == np.uint8

    def test_twopass_multichannel(self):
        sdr, hdr = self._inputs()
        gains, gmin, gmax = gainmap.gainmap_float_pass(
            sdr, hdr, sdr_fmt=ImgFmt.YUV420, hdr_fmt=ImgFmt.P010,
            sdr_cg=ColorGamut.DISPLAY_P3, hdr_cg=ColorGamut.BT2100,
            ct=ColorTransfer.HLG, scale=1, multichannel=True,
            use_luminance=False, sdr_is_601=True, use_base_cg=False)
        assert np.asarray(gains).shape == (3, 32, 32)
        lo, hi = gainmap.resolve_boost_bounds(
            np.asarray(gmin), np.asarray(gmax), multichannel=True,
            min_content_boost=None, max_content_boost=None, merge_channels=False)
        assert np.all(hi > lo)
        enc = gainmap.encode_gainmap_twopass(
            gains, jnp_arr(lo), jnp_arr(hi), np.float32(1.0))
        assert np.asarray(enc).shape == (3, 32, 32)


def jnp_arr(x):
    import jax.numpy as jnp
    return jnp.asarray(x)


class TestApplyGainmap:
    def test_decode_linear_identity_gain(self):
        """Gain map of all-zeros with min_boost=1 -> output == sdr linear."""
        h, w = 8, 8
        sdr_yuv = np.zeros((3, h, w), np.float32)
        sdr_yuv[0] = 0.5
        gm = np.zeros((1, h // 2, w // 2), np.uint8)
        meta = {
            "gamma": np.ones(3, np.float32),
            "min_content_boost": np.ones(3, np.float32),
            "max_content_boost": np.full(3, 4.0, np.float32),
            "offset_sdr": np.zeros(3, np.float32),
            "offset_hdr": np.zeros(3, np.float32),
        }
        out = apply_ops.apply_gainmap_core(
            sdr_yuv, gm, meta, scale_k=2, weight=1.0,
            out_ct=ColorTransfer.LINEAR, sdr_cg=ColorGamut.BT709,
            hdr_cg=ColorGamut.BT709, use_base_cg=True)
        packed = np.asarray(out)
        r16 = packed[..., 0].view(np.float16)
        # decode routes sRGB EOTF through the reference's 1024-entry LUT grid
        from libultrahdr_tpu.ops.lut_parity import SRGB_INV_OETF_N, lut_quantize
        expected = float(np.asarray(colors.srgb_inv_oetf(
            lut_quantize(np.float32(0.5), SRGB_INV_OETF_N))))
        np.testing.assert_allclose(r16.astype(np.float32), expected, rtol=2e-3)

    def test_decode_pq_range(self):
        h, w = 8, 8
        rng = np.random.default_rng(8)
        sdr_yuv = np.zeros((3, h, w), np.float32)
        sdr_yuv[0] = rng.random((h, w), np.float32)
        gm = rng.integers(0, 256, (1, 4, 4), dtype=np.uint8)
        meta = {
            "gamma": np.ones(3, np.float32),
            "min_content_boost": np.ones(3, np.float32),
            "max_content_boost": np.full(3, 1000 / 203.0, np.float32),
            "offset_sdr": np.full(3, 1e-7, np.float32),
            "offset_hdr": np.full(3, 1e-7, np.float32),
        }
        out = np.asarray(apply_ops.apply_gainmap_core(
            sdr_yuv, gm, meta, scale_k=2, weight=1.0,
            out_ct=ColorTransfer.PQ, sdr_cg=ColorGamut.BT709,
            hdr_cg=ColorGamut.BT2100, use_base_cg=True))
        assert out.dtype == np.uint32
        # alpha bits set
        assert np.all((out >> 30) == 0x3)
