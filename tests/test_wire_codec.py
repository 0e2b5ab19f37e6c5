"""Upload wire codec (delta7 bit-sliced pack, jpeg_entropy.cpp
uhdr_pack_delta7 + fused._delta7_decode_plane): losslessness, escape
handling, overflow fallback, and end-to-end byte equality of the fused
encode whichever wire path carried the input."""

import jax.numpy as jnp
import numpy as np
import pytest

from libultrahdr_tpu import fused
from libultrahdr_tpu.jpeg import native
from libultrahdr_tpu.jpegr import JpegR
from libultrahdr_tpu.types import (ColorGamut, ColorRange, ColorTransfer,
                                   EncPreset, ImgFmt, RawImage)

W, H = 256, 128


pytestmark = pytest.mark.slow  # pipelined encode e2e


def _smooth_plane(h, w, seed=0, edges=True):
    rs = np.random.RandomState(seed)
    yy, xx = np.mgrid[0:h, 0:w].astype(np.float32)
    v = 400 + 250 * np.sin(xx / 37.0) + 150 * np.cos(yy / 23.0)
    v += rs.rand(h, w) * 24            # mild noise: deltas stay in 7 bits
    if edges:                          # sharp steps: a few escapes
        v[:, w // 3:] += 400
        v[h // 2:, :] -= 300
    return (np.clip(v, 0, 1023).astype(np.uint16) << 6)


def _roundtrip(plane, uv):
    packed = native.pack_delta7(plane, uv)
    assert packed is not None
    words, ei, ev = packed
    out = fused._delta7_decode_plane(
        jnp.asarray(words), jnp.asarray(ei), jnp.asarray(ev),
        plane.shape[0], plane.shape[1], uv)
    np.testing.assert_array_equal(np.asarray(out), plane & np.uint16(0xFFC0))


def test_delta7_roundtrip_luma():
    _roundtrip(_smooth_plane(H, W), False)


def test_delta7_roundtrip_uv_interleaved():
    # U and V carry different gradients; stride-2 deltas must not mix them
    u = _smooth_plane(H // 2, W // 2, seed=1, edges=False)
    v = _smooth_plane(H // 2, W // 2, seed=2)
    uv = np.empty((H // 2, W), np.uint16)
    uv[:, 0::2] = u
    uv[:, 1::2] = v
    _roundtrip(uv, True)


def test_delta7_roundtrip_unaligned_tail():
    # h*w not a multiple of 32 exercises the padded tail group
    _roundtrip(_smooth_plane(31, 50), False)


def test_delta7_overflow_returns_none():
    rs = np.random.RandomState(3)
    # big enough that ~88% escape rate exceeds the 64K escape cap
    noise = (rs.randint(0, 1024, (512, 256)).astype(np.uint16) << 6)
    assert native.pack_delta7(noise, False) is None


def test_batched_pipeline_matches_single(monkeypatch):
    """The K-batched program (one shared compaction across images) must
    produce byte-identical JPEG_R files to per-image fused encodes."""
    monkeypatch.setenv("UHDR_TPU_BATCH_K", "4")
    imgs = []
    for i in range(5):  # 5 = one batch of 4 + a single-image tail job
        y = _smooth_plane(H, W, seed=10 + i)
        uv = _smooth_plane(H // 2, W, seed=20 + i, edges=False)
        imgs.append(RawImage(ImgFmt.P010, ColorGamut.BT2100,
                             ColorTransfer.HLG, ColorRange.FULL, W, H,
                             [y, uv]))
    jr = JpegR(map_dimension_scale_factor=2, use_multi_channel_gainmap=False,
               preset=EncPreset.REALTIME)
    batched = fused.encode_api0_p010_pipelined(jr, imgs, quality=92)
    singles = [jr.encode_api0(im, quality=92) for im in imgs]
    assert batched == singles


@pytest.mark.parametrize("two_d,bits", [(True, 5), (True, 6), (True, 4),
                                        (False, 6), (True, 8)])
def test_delta_roundtrip_modes(two_d, bits):
    """Generalized wire (2D predictor / variable code width) is lossless
    through pack -> device decode for every supported mode."""
    plane = _smooth_plane(H, W, seed=6)
    packed = native.pack_delta7(plane, False, two_d=two_d, bits=bits)
    assert packed is not None
    words, ei, ev = packed
    out = fused._delta_decode_plane(
        jnp.asarray(words), jnp.asarray(ei), jnp.asarray(ev), H, W, False,
        bits, two_d)
    np.testing.assert_array_equal(np.asarray(out), plane & np.uint16(0xFFC0))
    # interleaved UV with distinct per-channel gradients
    u = _smooth_plane(H // 2, W // 2, seed=7, edges=False)
    v = _smooth_plane(H // 2, W // 2, seed=8)
    uv = np.empty((H // 2, W), np.uint16)
    uv[:, 0::2] = u
    uv[:, 1::2] = v
    packed = native.pack_delta7(uv, True, two_d=two_d, bits=bits)
    assert packed is not None
    words, ei, ev = packed
    out = fused._delta_decode_plane(
        jnp.asarray(words), jnp.asarray(ei), jnp.asarray(ev),
        H // 2, W, True, bits, two_d)
    np.testing.assert_array_equal(np.asarray(out), uv & np.uint16(0xFFC0))


def test_fused_encode_identical_across_wire_modes(monkeypatch):
    """UHDR_TPU_WIRE is byte-invisible: fused API-0 output is identical
    through the 2d5 wire and the default 1d7 wire."""
    y = _smooth_plane(H, W, seed=30)
    uv = _smooth_plane(H // 2, W, seed=31, edges=False)
    img = RawImage(ImgFmt.P010, ColorGamut.BT2100, ColorTransfer.HLG,
                   ColorRange.FULL, W, H, [y, uv])
    jr = JpegR(map_dimension_scale_factor=2, use_multi_channel_gainmap=False,
               preset=EncPreset.REALTIME)
    monkeypatch.setenv("UHDR_TPU_WIRE", "1d7")
    via_1d7 = jr.encode_api0(img, quality=92)
    monkeypatch.setenv("UHDR_TPU_WIRE", "2d5")
    assert fused._wire_mode()[0][:2] == (True, 5)
    via_2d5 = jr.encode_api0(img, quality=92)
    assert via_2d5 == via_1d7
    monkeypatch.setenv("UHDR_TPU_WIRE", "auto")
    via_auto = jr.encode_api0(img, quality=92)
    assert via_auto == via_1d7


def test_wire_mode_parse(monkeypatch):
    cap = fused.native.DELTA7_ESC_CAP
    monkeypatch.setenv("UHDR_TPU_WIRE", "2d6")
    assert fused._wire_mode() == ((True, 6, cap), fused._WIRE_1D7)
    monkeypatch.setenv("UHDR_TPU_WIRE", "1d7")
    assert fused._wire_mode() == (fused._WIRE_1D7,)
    monkeypatch.setenv("UHDR_TPU_WIRE", "garbage")
    assert fused._wire_mode() == (fused._WIRE_1D7,)
    monkeypatch.delenv("UHDR_TPU_WIRE")
    assert fused._wire_mode() == fused._WIRE_LADDER
    assert fused._WIRE_LADDER[0] == (True, 4, 8192)


def _rgba1010102_img(seed=40):
    rs = np.random.RandomState(seed)
    base = _smooth_plane(H, W, seed=seed) >> 6        # 10-bit values
    r = base
    g = np.clip(base + rs.randint(-3, 4, base.shape), 0, 1023)
    b = np.clip(1023 - base, 0, 1023)
    p = (r.astype(np.uint32) | (g.astype(np.uint32) << 10)
         | (b.astype(np.uint32) << 20) | np.uint32(0x3) << 30)
    return RawImage(ImgFmt.RGBA1010102, ColorGamut.BT2100, ColorTransfer.HLG,
                    ColorRange.FULL, W, H, [np.ascontiguousarray(p)])


def _rgbaf16_img(seed=41):
    vals = (_smooth_plane(H, W, seed=seed) >> 6).astype(np.float32) / 1023.0
    comp = np.empty((H, W, 4), np.float16)
    comp[..., 0] = vals.astype(np.float16)
    comp[..., 1] = (vals * 0.5).astype(np.float16)
    comp[..., 2] = (1.0 - vals).astype(np.float16)
    comp[..., 3] = np.float16(1.0)
    return RawImage(ImgFmt.RGBAF16, ColorGamut.BT2100, ColorTransfer.LINEAR,
                    ColorRange.FULL, W, H,
                    [np.ascontiguousarray(comp).view(np.uint16)])


@pytest.mark.parametrize("make_img", [_rgba1010102_img, _rgbaf16_img])
def test_rgb_wire_byte_invisible(monkeypatch, make_img):
    """RGB-input uploads through the delta wire produce byte-identical
    JPEG_R files to the raw upload path."""
    img = make_img()
    jr = JpegR(map_dimension_scale_factor=2, use_multi_channel_gainmap=False,
               preset=EncPreset.REALTIME)
    via_wire = jr.encode_api0(img, quality=92)
    monkeypatch.setattr(fused, "pack_rgb_wire", lambda *a, **k: None)
    via_raw = jr.encode_api0(img, quality=92)
    assert via_wire == via_raw


def test_rgb_wire_varying_alpha_falls_back():
    img = _rgba1010102_img()
    p = img.planes[0].copy()
    p[0, 0] &= np.uint32(0x3FFFFFFF)        # one transparent pixel
    assert fused.pack_rgb_wire(p, ImgFmt.RGBA1010102, 5) is None


def test_coeff_wire4_roundtrip():
    """The 4-bit coefficient wire (decode upload) is lossless through
    pack_coeff_wire4 -> _unpack_coeff_wire4, including escapes."""
    rs = np.random.RandomState(5)
    shapes = [(6, 10), (3, 5)]
    planes = []
    for bh, bw in shapes:
        c = np.zeros((bh, bw, 64), np.int16)
        c[..., 0] = rs.randint(-500, 500, (bh, bw))
        c[..., 1:20] = rs.randint(-6, 7, (bh, bw, 19))   # in-range ACs
        c[0, 0, 30] = 900                                 # escapes
        c[-1, -1, 63] = -1023
        planes.append(c)
    blob = fused.pack_coeff_wire4(planes)
    assert blob is not None
    out = fused._unpack_coeff_wire4(
        jnp.asarray(np.frombuffer(blob, np.uint8)),
        tuple(s for s in shapes))
    for c, o in zip(planes, out):
        np.testing.assert_array_equal(np.asarray(o), c.astype(np.int32))


def test_coeff_wire4_overflow_returns_none():
    rs = np.random.RandomState(6)
    c = np.zeros((64, 64, 64), np.int16)
    c[..., 1:] = rs.randint(-200, 200, (64, 64, 63))   # ~92% escape rate
    assert fused.pack_coeff_wire4([c]) is None


def test_fused_encode_identical_across_wire_paths(monkeypatch):
    """The wire codec must be invisible: fused API-0 bytes are identical
    whether the input travelled delta7-packed or dense-10-bit-packed."""
    y = _smooth_plane(H, W)
    uv = _smooth_plane(H // 2, W, seed=4, edges=False)
    img = RawImage(ImgFmt.P010, ColorGamut.BT2100, ColorTransfer.HLG,
                   ColorRange.FULL, W, H, [y, uv])
    jr = JpegR(map_dimension_scale_factor=2, use_multi_channel_gainmap=False,
               preset=EncPreset.REALTIME)
    via_delta = jr.encode_api0(img, quality=92)
    monkeypatch.setattr(fused, "pack_delta7_wire", lambda *a, **k: None)
    via_dense = jr.encode_api0(img, quality=92)
    assert via_delta == via_dense
