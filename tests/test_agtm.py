"""AGTM (SMPTE 2094-50) gain-map generation tests
(models /root/reference/tests/agtm_test.cpp coverage)."""

import numpy as np
import pytest

from libultrahdr_tpu import agtm
from libultrahdr_tpu.types import (ColorGamut, ColorRange, ColorTransfer,
                                   ImgFmt, RawImage)


def _p010(w=64, h=32):
    rs = np.random.RandomState(2)
    y = (rs.randint(0, 1024, (h, w)).astype(np.uint16) << 6)
    uv = (rs.randint(256, 768, (h // 2, w)).astype(np.uint16) << 6)
    return RawImage(ImgFmt.P010, ColorGamut.BT2100, ColorTransfer.HLG,
                    ColorRange.FULL, w, h, [y, uv])


class TestPchip:
    def test_interpolates_knots_exactly(self):
        x = np.array([0.0, 0.3, 0.7, 1.0])
        y = np.array([0.0, 1.0, 1.5, 2.0])
        out = agtm.pchip_eval(x, y, x)
        np.testing.assert_allclose(out, y, atol=1e-12)

    def test_monotone_data_monotone_interp(self):
        x = np.array([0.0, 0.2, 0.5, 1.0])
        y = np.array([0.0, 0.1, 1.4, 2.0])
        q = np.linspace(0, 1, 1001)
        out = agtm.pchip_eval(x, y, q)
        assert np.all(np.diff(out) >= -1e-9)

    def test_clamps_outside_range(self):
        x = np.array([0.2, 0.8])
        y = np.array([1.0, 3.0])
        out = agtm.pchip_eval(x, y, np.array([0.0, 1.0]))
        np.testing.assert_allclose(out, [1.0, 3.0])

    def test_rejects_bad_knots(self):
        from libultrahdr_tpu.errors import UhdrError
        with pytest.raises(UhdrError):
            agtm.pchip_coefficients(np.array([0.5, 0.5]), np.array([0, 1]))


class TestAgtmGenerate:
    def _metadata(self, h_log2=2.0):
        mix = agtm.ComponentMix(rgb=(0.0, 0.0, 0.0), component=1.0)
        rule = agtm.GainCurveRule(
            alternate_hdr_headroom_log2=h_log2, mix=mix,
            curve=[(0.0, 0.0), (0.5, 1.0), (1.0, 2.0)])
        return agtm.DynamicMetadata(baseline_hdr_headroom_log2=0.0,
                                    rules=[rule])

    def test_generates_rgb888_map(self):
        img = _p010()
        gm, md = agtm.generate_gainmap_agtm(img, self._metadata())
        assert gm.fmt == ImgFmt.RGB888
        assert gm.w == img.w and gm.h == img.h
        assert md.hdr_capacity_max == pytest.approx(4.0)
        assert md.min_content_boost[0] == 1.0
        p = gm.planes[0]
        assert p.shape == (img.h, img.w, 3)
        assert p.min() >= 0 and p.max() <= 255
        # all three channels identical (single log gain, agtm.cpp:190-194)
        assert np.array_equal(p[..., 0], p[..., 1])

    def test_capacity_interpolation_between_rules(self):
        mix = agtm.ComponentMix(component=1.0)
        r1 = agtm.GainCurveRule(1.0, mix, [(0.0, 0.0), (1.0, 1.0)])
        r2 = agtm.GainCurveRule(3.0, mix,
                                [(0.0, 0.0), (0.5, 2.5), (1.0, 3.0)])
        md_in = agtm.DynamicMetadata(0.0, [r1, r2])
        img = _p010()
        gm_mid, md = agtm.generate_gainmap_agtm(img, md_in,
                                                hdr_capacity_max=4.0)
        assert md.hdr_capacity_max == 4.0  # clamped target = log2 4 = 2.0
        gm_lo, _ = agtm.generate_gainmap_agtm(img, md_in,
                                              hdr_capacity_max=2.0)
        # different target headrooms must produce different maps
        assert not np.array_equal(gm_mid.planes[0], gm_lo.planes[0])

    def test_baseline_only_gives_zero_gain(self):
        md_in = agtm.DynamicMetadata(baseline_hdr_headroom_log2=1.0,
                                     rules=[])
        img = _p010()
        gm, md = agtm.generate_gainmap_agtm(img, md_in)
        # log gain 0 everywhere -> affine maps to (0 - lo)/(hi - lo) = 0
        assert int(gm.planes[0].max()) == 0
