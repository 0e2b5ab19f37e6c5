"""Native host decode engine (jpeg/_native/host_decode.cpp): the CPU fast
path for the reference's decode-to-host-memory contract
(jpegr.cpp:1384-1699).

Gates:
  - the C++ AAN IDCT matches the device (MXU) IDCT within 1 code value;
  - full decode_host output matches the device decode path at >=55 dB
    per 10-bit channel (libm vs XLA transcendentals + LUT grid choices
    forbid bit-equality; the cross-implementation contract is the same
    >=60 dB PSNR gate both paths pass against the reference binary).
"""

import numpy as np
import pytest

from libultrahdr_tpu.jpeg import native
from libultrahdr_tpu.jpegr import JpegR
from libultrahdr_tpu.types import (ColorGamut, ColorRange, ColorTransfer,
                                   EncPreset, ImgFmt, RawImage)

W, H = 128, 96


def _p010(seed=6, w=W, h=H):
    rs = np.random.RandomState(seed)
    yy, xx = np.mgrid[0:h, 0:w].astype(np.float32)
    lum = 0.5 + 0.4 * np.sin(xx / 17.0) * np.cos(yy / 13.0)
    lum += rs.rand(h, w) * 0.05
    y = (np.clip(lum * 1023, 0, 1023).astype(np.uint16) << 6)
    uv = (rs.randint(300, 700, (h // 2, w)).astype(np.uint16) << 6)
    return RawImage(ImgFmt.P010, ColorGamut.BT2100, ColorTransfer.HLG,
                    ColorRange.FULL, w, h, [y, uv])


def test_host_idct_matches_device():
    from libultrahdr_tpu.jpeg.dct import forward_plane, inverse_plane
    from libultrahdr_tpu.jpeg.tables import (STD_LUMA_QUANT,
                                             scaled_quant_table)
    rs = np.random.RandomState(3)
    plane = rs.randint(0, 256, (64, 80)).astype(np.uint8)
    qt = scaled_quant_table(STD_LUMA_QUANT, 90)
    coeffs = np.asarray(forward_plane(plane, qt))
    dev = np.asarray(inverse_plane(coeffs, qt, 64, 80))
    host = native.idct_plane(coeffs, qt)[:64, :80]
    diff = np.abs(dev.astype(int) - host.astype(int))
    assert diff.max() <= 1
    assert (diff > 0).mean() < 0.02


def _psnr10(a, b, shift):
    ca = ((a >> shift) & 0x3FF).astype(np.float64)
    cb = ((b >> shift) & 0x3FF).astype(np.float64)
    mse = np.mean((ca - cb) ** 2)
    return 200.0 if mse == 0 else 10 * np.log10(1023.0 ** 2 / mse)


@pytest.mark.parametrize("out_ct", [ColorTransfer.HLG, ColorTransfer.PQ])
@pytest.mark.parametrize("scale,multichannel", [(1, False), (4, False),
                                                (2, True)])
def test_decode_host_matches_device_path(out_ct, scale, multichannel):
    jr = JpegR(map_dimension_scale_factor=scale,
               use_multi_channel_gainmap=multichannel,
               preset=EncPreset.REALTIME)
    data = jr.encode_api0(_p010(), quality=92)
    dev, md_dev, _ = JpegR().decode(data, output_ct=out_ct)
    host, md_host = JpegR().decode_host(data, output_ct=out_ct)
    assert md_host.hdr_capacity_max == md_dev.hdr_capacity_max
    assert host.w == dev.w and host.h == dev.h
    pd, ph = np.asarray(dev.planes[0]), np.asarray(host.planes[0])
    for s in (0, 10, 20):
        psnr = _psnr10(pd, ph, s)
        assert psnr >= 55.0, f"channel {s}: {psnr:.1f} dB"


def test_decode_host_linear_f16():
    jr = JpegR(map_dimension_scale_factor=2, preset=EncPreset.REALTIME)
    data = jr.encode_api0(_p010(), quality=92)
    dev, _, _ = JpegR().decode(data, output_ct=ColorTransfer.LINEAR,
                               output_fmt=ImgFmt.RGBAF16)
    host, _ = JpegR().decode_host(data, output_ct=ColorTransfer.LINEAR)
    fd = np.asarray(dev.planes[0]).view(np.float16).astype(np.float64)
    fh = np.asarray(host.planes[0]).view(np.float16).astype(np.float64)
    mse = np.mean((fd[..., :3] - fh[..., :3]) ** 2)
    peak = 10000.0 / 203.0
    assert 10 * np.log10(peak ** 2 / max(mse, 1e-12)) >= 55.0


def test_decode_host_rejects_srgb():
    from libultrahdr_tpu.errors import UhdrError
    jr = JpegR(map_dimension_scale_factor=2, preset=EncPreset.REALTIME)
    data = jr.encode_api0(_p010(), quality=92)
    with pytest.raises(UhdrError):
        JpegR().decode_host(data, output_ct=ColorTransfer.SRGB)


def test_native_ycbcr_to_rgb888():
    """The native RGB-coded-gainmap color decode (uhdr_ycbcr_to_rgb888) is
    within 1 code of the Rec.601 formula at every pixel (FMA contraction
    can move rounding ties by one) and clamps at both rails."""
    from libultrahdr_tpu.jpeg import native as jn
    rs = np.random.RandomState(11)
    y, cb, cr = [rs.randint(0, 256, (61, 97)).astype(np.uint8)
                 for _ in range(3)]
    got = jn.ycbcr_to_rgb888(y, cb, cr)
    yf = y.astype(np.float64)
    u = cb.astype(np.float64) - 128.0
    v = cr.astype(np.float64) - 128.0
    r = yf + 1.402 * v
    g = yf - 0.344136286 * u - 0.714136286 * v
    b = yf + 1.772 * u
    ref = np.stack([np.clip(np.round(r), 0, 255),
                    np.clip(np.round(g), 0, 255),
                    np.clip(np.round(b), 0, 255)], axis=-1).astype(np.uint8)
    assert np.abs(got.astype(int) - ref.astype(int)).max() <= 1
    # rails: saturated chroma must clamp, not wrap
    full = jn.ycbcr_to_rgb888(np.full((4, 4), 255, np.uint8),
                              np.full((4, 4), 255, np.uint8),
                              np.full((4, 4), 255, np.uint8))
    assert full[..., 0].max() == 255 and full.min() >= 0
    zero = jn.ycbcr_to_rgb888(np.zeros((4, 4), np.uint8),
                              np.zeros((4, 4), np.uint8),
                              np.zeros((4, 4), np.uint8))
    assert zero[..., 2].min() == 0


@pytest.mark.parametrize("gamma,multichannel", [(1.5, False), (2.2, True)])
def test_decode_host_scale1_gamma(gamma, multichannel):
    """Map scale 1 fuses gamma + quantize + gain into a composed 256-entry
    LUT (host_decode.cpp gain8); it must agree with the device path for
    non-unit gamma, single- and multi-channel maps."""
    jr = JpegR(map_dimension_scale_factor=1, gamma=gamma,
               use_multi_channel_gainmap=multichannel,
               preset=EncPreset.REALTIME)
    data = jr.encode_api0(_p010(seed=9), quality=92)
    dev, _, _ = JpegR().decode(data, output_ct=ColorTransfer.HLG)
    host, _ = JpegR().decode_host(data, output_ct=ColorTransfer.HLG)
    pd, ph = np.asarray(dev.planes[0]), np.asarray(host.planes[0])
    for s in (0, 10, 20):
        psnr = _psnr10(pd, ph, s)
        assert psnr >= 55.0, f"gamma {gamma} mc {multichannel} ch {s}: {psnr:.1f} dB"


def test_native_ycc_to_rgba32_matches_numpy_twin():
    """uhdr_ycc_to_rgba32 (SIMD fused fancy upsample + jdcolor convert)
    is bit-identical to decoder._ycc_to_rgb_np for every sampling and
    odd-size edge case."""
    from libultrahdr_tpu.jpeg import decoder, native

    rs = np.random.RandomState(1)
    for key, (cwd, chd) in [("444", (1, 1)), ("420", (2, 2)),
                            ("422", (2, 1)), ("440", (1, 2)),
                            ("411", (4, 1)), ("410", (4, 2))]:
        for (h, w) in [(64, 96), (31, 49), (8, 8), (17, 254), (2, 2)]:
            cw, ch = -(-w // cwd), -(-h // chd)
            y = rs.randint(0, 256, (h, w)).astype(np.uint8)
            cb = rs.randint(0, 256, (ch, cw)).astype(np.uint8)
            cr = rs.randint(0, 256, (ch, cw)).astype(np.uint8)
            ref = decoder._ycc_to_rgb_np(y, cb, cr, key, h, w)
            refp = (ref[0].astype(np.uint32)
                    | (ref[1].astype(np.uint32) << 8)
                    | (ref[2].astype(np.uint32) << 16)
                    | np.uint32(0xFF000000))
            got = native.ycc_to_rgba32(y, cb, cr, key, h, w)
            np.testing.assert_array_equal(got, refp, err_msg=f"{key} {h}x{w}")
