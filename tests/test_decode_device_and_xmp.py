"""decode_to_device (device-resident output) and XMP-metadata-mode e2e."""

import numpy as np
import pytest

from libultrahdr_tpu.jpegr import JpegR, is_uhdr_image
from libultrahdr_tpu.types import (ColorGamut, ColorRange, ColorTransfer,
                                   EncPreset, ImgFmt, RawImage)


def _p010(w=96, h=64):
    rs = np.random.RandomState(6)
    y = (rs.randint(0, 1024, (h, w)).astype(np.uint16) << 6)
    uv = (rs.randint(300, 700, (h // 2, w)).astype(np.uint16) << 6)
    return RawImage(ImgFmt.P010, ColorGamut.BT2100, ColorTransfer.HLG,
                    ColorRange.FULL, w, h, [y, uv])


def test_decode_to_device_matches_decode():
    jr = JpegR(map_dimension_scale_factor=2, use_multi_channel_gainmap=False,
               preset=EncPreset.REALTIME)
    data = jr.encode_api0(_p010(), quality=92)
    dev, md = JpegR().decode_to_device(data, output_ct=ColorTransfer.HLG)
    import jax
    assert isinstance(dev, jax.Array)
    host, md2, _ = JpegR().decode(data, output_ct=ColorTransfer.HLG)
    np.testing.assert_array_equal(np.asarray(dev),
                                  np.asarray(host.planes[0]))
    assert md.hdr_capacity_max == md2.hdr_capacity_max


def test_decode_to_device_rejects_srgb():
    from libultrahdr_tpu.errors import UhdrError
    jr = JpegR(map_dimension_scale_factor=1)
    data = jr.encode_api0(_p010(), quality=92)
    with pytest.raises(UhdrError):
        JpegR().decode_to_device(data, output_ct=ColorTransfer.SRGB)


class TestXmpMode:
    """Adobe hdrgm XMP metadata mode (UHDR_WRITE_XMP analog; the
    Android.bp build uses XMP instead of ISO, Android.bp:37-38)."""

    def test_xmp_roundtrip(self):
        jr = JpegR(map_dimension_scale_factor=2,
                   use_multi_channel_gainmap=False,
                   preset=EncPreset.REALTIME, write_iso=False,
                   write_xmp=True)
        data = jr.encode_api0(_p010(), quality=92, use_fused=False)
        assert is_uhdr_image(data)
        dest, md, _ = JpegR().decode(data, output_ct=ColorTransfer.HLG)
        assert md.hdr_capacity_max == pytest.approx(1000.0 / 203.0, rel=1e-4)
        assert md.min_content_boost[0] == pytest.approx(1.0)
        assert dest.w == 96 and dest.h == 64

    def test_xmp_mode_fused(self):
        jr = JpegR(map_dimension_scale_factor=2,
                   use_multi_channel_gainmap=False,
                   preset=EncPreset.REALTIME, write_iso=False,
                   write_xmp=True)
        fused = jr.encode_api0(_p010(), quality=92)
        assert is_uhdr_image(fused)
        _, md, _ = JpegR().decode(fused, output_ct=ColorTransfer.HLG)
        assert md.hdr_capacity_max == pytest.approx(1000.0 / 203.0, rel=1e-4)

    def test_both_metadata_modes(self):
        jr = JpegR(map_dimension_scale_factor=2, write_iso=True,
                   write_xmp=True, preset=EncPreset.REALTIME)
        data = jr.encode_api0(_p010(), quality=92, use_fused=False)
        from libultrahdr_tpu.jpeg import parse_jpeg
        from libultrahdr_tpu.container import segments
        r = segments.scan_jpeg_images(data, limit=2)
        gm_info = parse_jpeg(data[r[1][0]:r[1][1]], parse_only=True)
        assert gm_info.iso is not None and gm_info.xmp is not None
