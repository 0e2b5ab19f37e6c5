"""Fused API-0 encode vs the general path: same pixels, same metadata.

The fused path packs scans with one restart segment per MCU row, so the
JPEG bytes differ from the general path — but the quantized coefficients
are identical, hence decodes must match exactly, and the container
metadata must be identical."""

import numpy as np
import pytest

from libultrahdr_tpu.jpegr import JpegR, is_uhdr_image
from libultrahdr_tpu.types import (ColorGamut, ColorRange, ColorTransfer,
                                   EncPreset, ImgFmt, RawImage)


def _p010(w, h, seed=0):
    rs = np.random.RandomState(seed)
    yy, xx = np.mgrid[0:h, 0:w]
    y = (((np.sin(xx / 37.0) * 0.5 + 0.5) * (np.cos(yy / 23.0) * 0.5 + 0.5)
          * 1023).astype(np.uint16) << 6)
    uv = (rs.randint(300, 720, (h // 2, w)).astype(np.uint16) << 6)
    return RawImage(ImgFmt.P010, ColorGamut.BT2100, ColorTransfer.HLG,
                    ColorRange.FULL, w, h, [y, uv])


@pytest.mark.parametrize("multichannel", [False, True])
@pytest.mark.parametrize("dims", [(128, 64), (100, 54)])  # even + non-MCU
def test_fused_matches_general(multichannel, dims):
    w, h = dims
    img = _p010(w, h)
    jr = JpegR(map_dimension_scale_factor=2,
               use_multi_channel_gainmap=multichannel,
               preset=EncPreset.REALTIME)
    fused = jr.encode_api0(img, quality=90)
    general = jr.encode_api0(img, quality=90, use_fused=False)

    assert is_uhdr_image(fused)
    d_f, m_f, gm_f = JpegR().decode(fused, output_ct=ColorTransfer.HLG,
                                    return_gainmap=True)
    d_g, m_g, gm_g = JpegR().decode(general, output_ct=ColorTransfer.HLG,
                                    return_gainmap=True)
    # the two paths compile to different XLA programs, so float
    # reassociation shifts a few gain codes by +-1 pre-compression, which
    # JPEG round-trips into small local diffs; require tight agreement,
    # not bit equality (entropy packing itself is bit-exact:
    # test_device_entropy.py)
    gmd = np.abs(gm_f.planes[0].astype(int) - gm_g.planes[0].astype(int))
    assert gmd.max() <= 12 and gmd.mean() < 1.0
    pf, pg = np.asarray(d_f.planes[0]), np.asarray(d_g.planes[0])
    for s in (0, 10, 20):
        ch = np.abs(((pf >> s) & 0x3FF).astype(int)
                    - ((pg >> s) & 0x3FF).astype(int))
        assert ch.max() <= 24 and ch.mean() < 2.0
    for field in ("max_content_boost", "min_content_boost", "gamma",
                  "offset_sdr", "offset_hdr"):
        np.testing.assert_allclose(getattr(m_f, field), getattr(m_g, field),
                                   rtol=1e-6)
    assert m_f.use_base_cg == m_g.use_base_cg
    assert m_f.hdr_capacity_max == m_g.hdr_capacity_max


def test_fused_sdr_decode_matches():
    img = _p010(96, 48)
    jr = JpegR(map_dimension_scale_factor=1, use_multi_channel_gainmap=False)
    fused = jr.encode_api0(img, quality=85)
    general = jr.encode_api0(img, quality=85, use_fused=False)
    s_f, _, _ = JpegR().decode(fused, output_ct=ColorTransfer.SRGB)
    s_g, _, _ = JpegR().decode(general, output_ct=ColorTransfer.SRGB)
    np.testing.assert_array_equal(np.asarray(s_f.planes[0]),
                                  np.asarray(s_g.planes[0]))
