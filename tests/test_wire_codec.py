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
                                        (False, 6), (True, 8), (True, 3)])
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
    # default since round 5: the variable-width group wire first, with the
    # fixed rung ladder as the safety net
    assert fused._wire_mode() == ("vw",) + fused._WIRE_LADDER
    assert fused._WIRE_LADDER[0] == (True, 2, 8192)
    monkeypatch.setenv("UHDR_TPU_WIRE", "vw")
    assert fused._wire_mode() == ("vw",)


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
    """RGB-input uploads through the per-channel delta wire produce
    byte-identical JPEG_R files to the raw upload path."""
    # Persistent-cache OFF for this test: XLA CPU's executable.serialize()
    # of the raw-fallback rgb program crashes (SIGSEGV/SIGABRT inside XLA)
    # when the compile happens late in a long-lived process — observed
    # twice at this exact test in cold-cache full-suite runs.  Skipping
    # the persistent cache here costs one fresh ~15 s compile per run and
    # removes the crash deterministically (in-process jit caching is
    # unaffected).
    import jax
    jax.config.update("jax_enable_compilation_cache", False)
    try:
        _run_rgb_wire_byte_invisible(monkeypatch, make_img)
    finally:
        jax.config.update("jax_enable_compilation_cache", True)


def _run_rgb_wire_byte_invisible(monkeypatch, make_img):
    img = make_img()
    jr = JpegR(map_dimension_scale_factor=2, use_multi_channel_gainmap=False,
               preset=EncPreset.REALTIME)
    via_wire = jr.encode_api0(img, quality=92)
    monkeypatch.setattr(fused, "pack_vw_chan", lambda *a, **k: None)
    monkeypatch.setattr(fused, "pack_rgb_chan", lambda *a, **k: None)
    via_raw = jr.encode_api0(img, quality=92)
    assert via_wire == via_raw


@pytest.mark.parametrize("bits", [2, 3, 4, 6])
def test_rgb_chan_wire_roundtrip(bits):
    """v2 per-channel wire (pack_rgb_chan -> _decode_rgb_chan) is
    lossless at every rung."""
    ch = _gentle_base(2.0 ** (bits - 1) - 1, seed=47).astype(np.uint16)
    buf = fused.pack_rgb_chan(ch, bits)
    assert buf is not None
    out = fused._decode_rgb_chan(jnp.asarray(buf), H, W, bits)
    np.testing.assert_array_equal(np.asarray(out), ch)


def test_rgb_wire_v2_mixed_rungs():
    """A noisy channel rides a wider rung without dragging the smooth
    channels (and the encode stays byte-identical to raw upload)."""
    rs = np.random.RandomState(9)
    base = _gentle_base(1.0, seed=48).astype(np.uint32)
    noisy = np.clip(base + rs.randint(-6, 7, base.shape), 0, 1023
                    ).astype(np.uint32)
    p = np.ascontiguousarray(
        base | (noisy << 10) | ((1023 - base) << 20) | np.uint32(0x3) << 30)
    img = RawImage(ImgFmt.RGBA1010102, ColorGamut.BT2100, ColorTransfer.HLG,
                   ColorRange.FULL, W, H, [p])
    chans, alpha = fused._split_rgb_channels(p, ImgFmt.RGBA1010102)
    assert alpha == 3
    assert fused.pack_rgb_chan(chans[0], 2) is not None
    assert fused.pack_rgb_chan(chans[1], 2) is None      # noisy overflows
    assert fused.pack_rgb_chan(chans[1], 6) is not None
    jr = JpegR(map_dimension_scale_factor=2, use_multi_channel_gainmap=False,
               preset=EncPreset.REALTIME)
    via_wire = jr.encode_api0(img, quality=92)
    import unittest.mock as mock
    with mock.patch.object(fused, "pack_vw_chan", lambda *a, **k: None), \
            mock.patch.object(fused, "pack_rgb_chan", lambda *a, **k: None):
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


def test_coeff_wire3_roundtrip():
    """The 3-bit coefficient wire rung is lossless too (same layout,
    narrower slices, [-4,3] in-range window)."""
    rs = np.random.RandomState(7)
    shapes = [(5, 9), (2, 4)]
    planes = []
    for bh, bw in shapes:
        c = np.zeros((bh, bw, 64), np.int16)
        c[..., 0] = rs.randint(-500, 500, (bh, bw))
        c[..., 1:20] = rs.randint(-4, 4, (bh, bw, 19))   # in-range at 3 bits
        c[0, 0, 30] = 900                                 # escapes
        c[-1, -1, 63] = -1023
        c[0, 0, 40] = 7                                   # escapes at 3 bits
        planes.append(c)
    blob = fused.pack_coeff_wire3(planes)
    assert blob is not None
    out = fused._unpack_coeff_wire_n(
        jnp.asarray(np.frombuffer(blob, np.uint8)),
        tuple(s for s in shapes), 3)
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


def _lowpass_plane(h, w, seed=0):
    """Photographic-like content for the narrow rungs: smooth gradients
    plus step edges — escapes cluster at the edges (a few hundred), well
    inside the 8192 cap even at 3 bits/sample."""
    yy, xx = np.mgrid[0:h, 0:w].astype(np.float32)
    v = 400 + 250 * np.sin(xx / 37.0 + seed) + 150 * np.cos(yy / 23.0)
    v[:, w // 3:] += 400
    v[h // 2:, :] -= 300
    return (np.clip(v, 0, 1023).astype(np.uint16) << 6)


def _api1_pair(seed=50, lowpass=False):
    mk = _lowpass_plane if lowpass else _smooth_plane
    y = mk(H, W, seed=seed)
    uv = mk(H // 2, W, seed=seed + 1)
    hdr = RawImage(ImgFmt.P010, ColorGamut.BT2100, ColorTransfer.HLG,
                   ColorRange.FULL, W, H, [y, uv])
    sdr = JpegR().tone_map(hdr)
    return hdr, sdr


@pytest.mark.parametrize("hb,sb", [(3, 3), (4, 3), (5, 4), (6, 6)])
def test_api1_wire_roundtrip(hb, sb):
    """All five API-1 planes reconstruct exactly through the single-buffer
    wire (HDR P010 shift-6 codec + SDR u8 general codec)."""
    hdr, sdr = _api1_pair(lowpass=hb < 5)
    buf = fused.pack_api1_wire(hdr.planes[0], hdr.planes[1],
                               sdr.planes[:3], hb, sb)
    assert buf is not None
    hy, huv, sp = fused._decode_api1_wire(jnp.asarray(buf), H, W, hb, sb)
    np.testing.assert_array_equal(np.asarray(hy),
                                  hdr.planes[0] & np.uint16(0xFFC0))
    np.testing.assert_array_equal(np.asarray(huv),
                                  hdr.planes[1] & np.uint16(0xFFC0))
    for got, want in zip(sp, sdr.planes[:3]):
        np.testing.assert_array_equal(np.asarray(got), want)


@pytest.mark.parametrize("preset", [EncPreset.REALTIME,
                                    EncPreset.BEST_QUALITY])
def test_api1_wire_byte_invisible(monkeypatch, preset):
    """encode_api1 output is identical whether the five planes travelled
    the delta wire or raw (both presets: one-pass and two-pass)."""
    hdr, sdr = _api1_pair(seed=60)
    jr = JpegR(map_dimension_scale_factor=2,
               use_multi_channel_gainmap=False, preset=preset)
    via_wire = jr.encode_api1(hdr, sdr, quality=92)
    monkeypatch.setenv("UHDR_TPU_WIRE_API1", "raw")
    via_raw = jr.encode_api1(hdr, sdr, quality=92)
    assert via_wire == via_raw


def test_api1_wire_overflow_falls_back(monkeypatch):
    """Noise content overflows every rung's escape list; the encode must
    silently ride another transport (the vw wire fits any P010/I420
    content; with wires disabled, raw) and match raw byte-for-byte."""
    rs = np.random.RandomState(9)
    y = (rs.randint(0, 1024, (H, W)).astype(np.uint16) << 6)
    uv = (rs.randint(0, 1024, (H // 2, W)).astype(np.uint16) << 6)
    hdr = RawImage(ImgFmt.P010, ColorGamut.BT2100, ColorTransfer.HLG,
                   ColorRange.FULL, W, H, [y, uv])
    sdr = JpegR().tone_map(hdr)
    for hb, sb in fused._API1_LADDER:
        assert fused.pack_api1_wire(y, uv, sdr.planes[:3], hb, sb) is None
    jr = JpegR(map_dimension_scale_factor=2,
               use_multi_channel_gainmap=False, preset=EncPreset.REALTIME)
    via_auto = jr.encode_api1(hdr, sdr, quality=92)
    monkeypatch.setenv("UHDR_TPU_WIRE_API1", "raw")
    assert via_auto == jr.encode_api1(hdr, sdr, quality=92)


@pytest.mark.smoke
def test_api1_vw_wire_roundtrip():
    """All five API-1 planes reconstruct exactly through the vw group
    wire (HDR planes shift-6, SDR u8 planes shift-0/base-128), including
    full-range noise that defeats every fixed rung."""
    rs = np.random.RandomState(31)
    y = (rs.randint(0, 1024, (H, W)).astype(np.uint16) << 6)
    uv = (rs.randint(0, 1024, (H // 2, W)).astype(np.uint16) << 6)
    sdr_planes = [rs.randint(0, 256, (H, W)).astype(np.uint8),
                  rs.randint(0, 256, (H // 2, W // 2)).astype(np.uint8),
                  rs.randint(0, 256, (H // 2, W // 2)).astype(np.uint8)]
    buf = fused.pack_api1_vw_wire(y, uv, sdr_planes)
    assert buf is not None
    hy, huv, sp = fused._decode_api1_vw(jnp.asarray(buf), H, W)
    np.testing.assert_array_equal(np.asarray(hy), y)
    np.testing.assert_array_equal(np.asarray(huv), uv)
    for got, want in zip(sp, sdr_planes):
        np.testing.assert_array_equal(np.asarray(got), want)


def test_api1_wire_ladder_parse(monkeypatch):
    monkeypatch.setenv("UHDR_TPU_WIRE_API1", "raw")
    assert fused._api1_wire_ladder() == ()
    monkeypatch.setenv("UHDR_TPU_WIRE_API1", "h5s3")
    assert fused._api1_wire_ladder() == ((5, 3),)
    monkeypatch.setenv("UHDR_TPU_WIRE_API1", "garbage")
    assert fused._api1_wire_ladder() == fused._API1_LADDER
    monkeypatch.delenv("UHDR_TPU_WIRE_API1")
    assert fused._api1_wire_ladder() == fused._API1_LADDER


# ---------------------------------------------------------------------------
# Decode-output DOWNLOAD wire (fused._pack_down_wire_1010102 on device,
# native.uhdr_unpack_delta2d on host)

@pytest.mark.parametrize("bits", [3, 4, 6])
def test_down_wire_roundtrip(bits):
    """Device-packed 2D-delta channels reconstruct the exact RGBA1010102
    words on host, alpha rewritten to the constant 3."""
    if bits < 6:
        # narrow rungs need noise-free gradients: 2D deltas amplify
        # per-pixel noise ~4x, overflowing the escape list
        base = (_lowpass_plane(H, W, seed=70) >> 6).astype(np.uint32)
        packed = (base | ((1023 - base) << 10) | (base << 20)
                  | np.uint32(0x3) << 30)
    else:
        packed = _rgba1010102_img(seed=70).planes[0]
    wire = fused._pack_down_wire_1010102(jnp.asarray(packed), h=H, w=W,
                                         bits=bits)
    out = fused.unpack_down_wire_1010102(np.asarray(wire), H, W, bits)
    assert out is not None
    np.testing.assert_array_equal(out, packed)


def test_down_wire_unaligned_tail():
    """h*w not a multiple of 32 exercises the padded tail group on both
    halves of the codec."""
    h, w = 31, 50
    base = (_smooth_plane(h, w, seed=71) >> 6).astype(np.uint32)
    packed = (base | ((1023 - base) << 10) | (base << 20)
              | np.uint32(0x3) << 30)
    wire = fused._pack_down_wire_1010102(jnp.asarray(packed), h=h, w=w,
                                         bits=4)
    out = fused.unpack_down_wire_1010102(np.asarray(wire), h, w, 4)
    assert out is not None
    np.testing.assert_array_equal(out, packed)


def test_down_wire_overflow_returns_none():
    """Noise content overflows the escape list; unpack reports it via
    None so the caller re-downloads raw."""
    rs = np.random.RandomState(12)
    packed = (rs.randint(0, 1 << 30, (H, W)).astype(np.uint32)
              | np.uint32(0x3) << 30)
    wire = fused._pack_down_wire_1010102(jnp.asarray(packed), h=H, w=W,
                                         bits=3)
    assert fused.unpack_down_wire_1010102(np.asarray(wire), H, W, 3) is None


@pytest.mark.parametrize("seed,noisy", [(73, False), (13, True)])
def test_fetch_packed_matches_raw(seed, noisy):
    """fetch_packed_1010102 is value-invisible whether the image rides
    the wire (smooth) or falls back to the raw download (noise)."""
    if noisy:
        rs = np.random.RandomState(seed)
        packed = (rs.randint(0, 1 << 30, (H, W)).astype(np.uint32)
                  | np.uint32(0x3) << 30)
    else:
        packed = _rgba1010102_img(seed=seed).planes[0]
    dev = jnp.asarray(packed)
    np.testing.assert_array_equal(
        fused.fetch_packed_1010102(dev, h=H, w=W), packed)


def test_down_wire_bits_parse(monkeypatch):
    monkeypatch.setenv("UHDR_TPU_WIRE_DOWN", "raw")
    assert fused._down_wire_bits() == 0
    monkeypatch.setenv("UHDR_TPU_WIRE_DOWN", "6")
    assert fused._down_wire_bits() == 6
    monkeypatch.setenv("UHDR_TPU_WIRE_DOWN", "garbage")
    assert fused._down_wire_bits() == 4
    monkeypatch.delenv("UHDR_TPU_WIRE_DOWN")
    assert fused._down_wire_bits() == 4


def test_decode_down_wire_value_invisible(monkeypatch):
    """decode() output is identical whether the RGBA1010102 result
    crossed the link delta-packed or raw."""
    y = _smooth_plane(H, W, seed=80)
    uv = _smooth_plane(H // 2, W, seed=81, edges=False)
    img = RawImage(ImgFmt.P010, ColorGamut.BT2100, ColorTransfer.HLG,
                   ColorRange.FULL, W, H, [y, uv])
    jr = JpegR(map_dimension_scale_factor=2,
               use_multi_channel_gainmap=False, preset=EncPreset.REALTIME)
    blob = jr.encode_api0(img, quality=92)
    via_wire = jr.decode(blob, output_ct=ColorTransfer.HLG)[0]
    monkeypatch.setenv("UHDR_TPU_WIRE_DOWN", "raw")
    via_raw = jr.decode(blob, output_ct=ColorTransfer.HLG)[0]
    np.testing.assert_array_equal(via_wire.planes[0], via_raw.planes[0])


def _f16_comp(seed=90, noisy=False):
    if noisy:
        rs = np.random.RandomState(seed)
        vals = rs.rand(H, W).astype(np.float32) * 100
    else:
        vals = (_lowpass_plane(H, W, seed=seed) >> 6).astype(np.float32)
        vals = vals / 1023.0 * 4.0
    comp = np.empty((H, W, 4), np.float16)
    comp[..., 0] = vals.astype(np.float16)
    comp[..., 1] = (vals * 0.6).astype(np.float16)
    comp[..., 2] = (4.0 - vals).astype(np.float16)
    comp[..., 3] = np.float16(1.0)
    return comp.view(np.uint16)


@pytest.mark.parametrize("bits", [6, 8])
def test_down_wire_f16_roundtrip(bits):
    """Device-packed f16 channels reconstruct the exact RGBAF16 bit
    patterns on host (alpha rewritten to half(1.0))."""
    comp = _f16_comp()
    wire = fused._pack_down_wire_f16(jnp.asarray(comp), h=H, w=W,
                                     bits=bits)
    out = fused.unpack_down_wire_f16(np.asarray(wire), H, W, bits)
    assert out is not None
    np.testing.assert_array_equal(out, comp)


@pytest.mark.parametrize("noisy", [False, True])
def test_fetch_packed_f16_matches_raw(noisy):
    comp = _f16_comp(seed=91, noisy=noisy)
    np.testing.assert_array_equal(
        fused.fetch_packed_f16(jnp.asarray(comp), h=H, w=W), comp)


def test_decode_linear_down_wire_value_invisible(monkeypatch):
    """LINEAR decode output is identical whether the RGBAF16 result
    crossed the link delta-packed or raw."""
    y = _smooth_plane(H, W, seed=82)
    uv = _smooth_plane(H // 2, W, seed=83, edges=False)
    img = RawImage(ImgFmt.P010, ColorGamut.BT2100, ColorTransfer.HLG,
                   ColorRange.FULL, W, H, [y, uv])
    jr = JpegR(map_dimension_scale_factor=2,
               use_multi_channel_gainmap=False, preset=EncPreset.REALTIME)
    blob = jr.encode_api0(img, quality=92)
    via_wire = jr.decode(blob, output_ct=ColorTransfer.LINEAR)[0]
    monkeypatch.setenv("UHDR_TPU_WIRE_DOWN", "raw")
    via_raw = jr.decode(blob, output_ct=ColorTransfer.LINEAR)[0]
    np.testing.assert_array_equal(via_wire.planes[0], via_raw.planes[0])


def test_down_wire_sticky_ladder(monkeypatch):
    """Grainy-like output overflows the 4-bit down wire; the fetch must
    climb to the 6-bit rung, remember it for the shape, and start there
    on the next frame (no repeated wasted 4-bit attempts)."""
    import jax.numpy as jnp
    h, w = 192, 192                      # escapes can exceed the 8k cap
    rs = np.random.RandomState(3)
    # +-6 grain: 2D residual spans ~+-24 — overflows the 4-bit window
    # (+-8) on far more than 8192 samples, fits the 6-bit window (+-32)
    ch = (512 + rs.randint(-6, 7, (h, w))).astype(np.uint32)
    packed = (ch | (ch << 10) | (ch << 20)
              | np.uint32(0x3) << 30)
    dev = jnp.asarray(packed)
    fused._DOWN_STICKY.clear()
    calls = []
    orig = fused._pack_down_wire_1010102
    def spy(p, *, h, w, bits, cap=fused._DOWN_ESC):
        calls.append(bits)
        return orig(p, h=h, w=w, bits=bits, cap=cap)
    monkeypatch.setattr(fused, "_pack_down_wire_1010102", spy)
    out1 = fused.fetch_packed_1010102(dev, h=h, w=w)
    np.testing.assert_array_equal(out1, packed)
    first = list(calls)
    assert first[0] == 4 and 6 in first                      # laddered
    sticky = fused._DOWN_STICKY.get(("1010102", h, w))
    calls.clear()
    out2 = fused.fetch_packed_1010102(dev, h=h, w=w)
    np.testing.assert_array_equal(out2, packed)
    if sticky == 6:
        assert calls == [6]                                  # no 4-bit retry
    else:
        assert sticky == 0 and calls == []                   # raw sticks
    fused._DOWN_STICKY.clear()


def test_coeff_wire_sparse_roundtrip():
    """The sparse (presence-mask + compacted-values) coefficient wire is
    lossless through pack_coeff_wire_sparse -> _unpack_coeff_wire_sparse,
    including int16 escapes patched into the compacted value array."""
    rs = np.random.RandomState(9)
    shapes = [(6, 10), (3, 5)]
    planes = []
    for bh, bw in shapes:
        c = np.zeros((bh, bw, 64), np.int16)
        c[..., 0] = rs.randint(-500, 500, (bh, bw))
        # sparse ACs: ~8% nonzero, values spanning int8
        nz = rs.rand(bh, bw, 63) < 0.08
        c[..., 1:][nz] = rs.randint(-120, 121, int(nz.sum())).astype(np.int16)
        c[0, 0, 30] = 900                                 # escapes
        c[-1, -1, 63] = -1023
        c[0, 0, 1] = -128                                 # int8 edge, no escape
        planes.append(c)
    blob = fused.pack_coeff_wire_sparse(planes)
    assert blob is not None
    out = fused._unpack_coeff_wire_sparse(
        jnp.asarray(np.frombuffer(blob, np.uint8)),
        tuple(s for s in shapes))
    for c, o in zip(planes, out):
        np.testing.assert_array_equal(np.asarray(o), c.astype(np.int32))


def test_coeff_wire_sparse_dense_returns_none():
    """Dense content (nonzeros above the 12% cap) must refuse the sparse
    wire so the ladder falls through to the bit-slice rungs."""
    rs = np.random.RandomState(10)
    c = np.zeros((64, 64, 64), np.int16)
    c[..., 1:] = rs.randint(1, 5, (64, 64, 63))      # 100% nonzero
    assert fused.pack_coeff_wire_sparse([c]) is None


def test_coeff_wire_ladder_prefers_sparse_on_natural_stats():
    """On q95-like sparsity the ladder's first fitting rung is the sparse
    wire, and it is the smallest of all fitting rungs."""
    rs = np.random.RandomState(11)
    c = np.zeros((40, 40, 64), np.int16)
    nz = rs.rand(40, 40, 63) < 0.05
    c[..., 1:][nz] = rs.randint(-3, 4, int(nz.sum())).astype(np.int16)
    c[..., 0] = rs.randint(-200, 200, (40, 40))
    planes = [c]
    sizes = {}
    for pack, k in fused.COEFF_WIRE_LADDER:
        blob = pack(planes)
        if blob is not None:
            sizes[k] = len(blob)
    assert "sp" in sizes
    assert sizes["sp"] == min(sizes.values())
    first_fit = next(k for pack, k in fused.COEFF_WIRE_LADDER
                     if pack(planes) is not None)
    assert first_fit == "sp"


def test_coeff_wire_best_mixed_kinds_roundtrip():
    """pack_coeff_wire_best lets a dense gain-map plane ride its own rung
    while sparse base planes stay on the sparse wire; the multi-kind blob
    is lossless through _unpack_coeff_wire_multi."""
    rs = np.random.RandomState(12)
    # planes must be big enough that the sparse rungs' static cap floors
    # (4096 values, 2048 escapes) beat the dense i16 rung's 128 B/block;
    # the dense plane must overflow the sparse caps for real
    shapes = [(48, 64), (24, 32), (24, 32), (64, 64)]
    planes = []
    for i, (bh, bw) in enumerate(shapes):
        c = np.zeros((bh, bw, 64), np.int16)
        c[..., 0] = rs.randint(-500, 500, (bh, bw))
        if i < 3:                 # sparse base planes
            nz = rs.rand(bh, bw, 63) < 0.05
            c[..., 1:][nz] = rs.randint(-3, 4, int(nz.sum())).astype(np.int16)
        else:                     # dense, wide-valued gain-map plane
            c[..., 1:] = rs.randint(-150, 151, (bh, bw, 63))
        planes.append(c)
    blob, kind = fused.pack_coeff_wire_best(planes)
    assert blob is not None
    kinds = kind.split(",")
    assert len(kinds) == 4 and kinds[0] in fused._GAP
    assert kinds[3] not in (set(fused._GAP) - {"gd"}) | {"i3", "i4"}
    out = fused._unpack_coeff_wire_multi(
        jnp.asarray(np.frombuffer(blob, np.uint8)),
        tuple(shapes), kind)
    for c, o in zip(planes, out):
        np.testing.assert_array_equal(np.asarray(o), c.astype(np.int32))


def _rung_plane(bh, bw, nzfrac, lo, hi, seed, blockwise=False):
    rs = np.random.RandomState(seed)
    c = np.zeros((bh, bw, 64), np.int16)
    c[..., 0] = rs.randint(-900, 900, (bh, bw))
    if blockwise:      # nonzeros clustered in a few blocks (two-level rungs)
        occ = rs.rand(bh, bw) < nzfrac
        nz = occ[..., None] & (rs.rand(bh, bw, 63) < 0.25)
    else:
        nz = rs.rand(bh, bw, 63) < nzfrac
    v = rs.randint(lo, hi, int(nz.sum())).astype(np.int16)
    v[v == 0] = 1
    c[..., 1:][nz] = v
    return c


@pytest.mark.parametrize("kind,plane", [
    ("ga", _rung_plane(60, 64, 0.015, -200, 200, 4)),
    ("gb", _rung_plane(60, 64, 0.05, -135, 135, 4)),
    ("gc", _rung_plane(60, 64, 0.11, -135, 135, 4)),
    ("gd", _rung_plane(60, 64, 0.28, -40, 40, 4)),
    ("ta", _rung_plane(60, 64, 0.05, -90, 90, 5, blockwise=True)),
    ("tb", _rung_plane(60, 64, 0.12, -90, 90, 6, blockwise=True)),
    ("tc", _rung_plane(60, 64, 0.28, -90, 90, 7, blockwise=True)),
    ("sr", _rung_plane(60, 64, 0.40, -40, 40, 8)),
    ("i16", _rung_plane(60, 64, 0.95, -2000, 2000, 9)),
])
def test_coeff_wire_new_rungs_roundtrip(kind, plane):
    """Gap-coded scatter rungs (incl. |v| > 127 escapes and >255-sample
    gaps bridged by dummies), two-level (block-occupancy) rungs, the
    wide-escape sr rung, and the terminal dense i16 rung: pack -> device
    unpack is lossless, the blob length matches the static size formula,
    and escapes (|v| > 127 under a compacted i8 value array) survive."""
    blob = fused._pack_plane(plane, kind)
    assert blob is not None
    assert len(blob) == fused._plane_rung_size(60, 64, kind)
    out, off = fused._unpack_plane(
        jnp.asarray(np.frombuffer(blob, np.uint8)), 0, 60, 64, kind)
    assert off == len(blob)
    np.testing.assert_array_equal(np.asarray(out), plane.astype(np.int32))


def test_coeff_wire_gap_rung_wide_gaps():
    """Destinations more than 255 samples apart ride zero-valued dummy
    entries; extreme case: two nonzeros at the far ends of the plane."""
    c = np.zeros((20, 20, 64), np.int16)
    c[0, 0, 1] = -300          # also an escape (|v| > 127)
    c[19, 19, 63] = 7
    blob = fused._pack_plane(c, "ga")
    assert blob is not None
    out, _ = fused._unpack_plane(
        jnp.asarray(np.frombuffer(blob, np.uint8)), 0, 20, 20, "ga")
    np.testing.assert_array_equal(np.asarray(out), c.astype(np.int32))


def test_coeff_wire_best_never_falls_back():
    """The i16 terminal rung always fits: even a pathological dense
    wide-valued plane gets a coalesced wire blob (the legacy per-plane
    upload is dead as a wire-overflow fallback)."""
    rs = np.random.RandomState(14)
    c = rs.randint(-2000, 2000, (24, 24, 64)).astype(np.int16)
    blob, kind = fused.pack_coeff_wire_best([c])
    assert blob is not None and kind == "i16"
    out = fused._unpack_coeff_wire_multi(
        jnp.asarray(np.frombuffer(blob, np.uint8)), ((24, 24),), kind)
    np.testing.assert_array_equal(np.asarray(out[0]), c.astype(np.int32))


def test_coeff_wire_best_picks_smallest_fitting_fast_rung():
    """Rung choice is min-size over the fitting FAST rungs (scatter/dense
    unpack; the mask rungs cost ~100 ms more device time than their best
    -case byte savings buy back): for every rung the static size formula
    matches the packed bytes, and no fitting fast rung is smaller than
    the chosen one."""
    c = _rung_plane(60, 64, 0.05, -90, 90, 15, blockwise=True)
    blob, kind = fused.pack_coeff_wire_best([c])
    sizes = {}
    for k in fused._PLANE_KINDS:
        b = fused._pack_plane(c, k)
        if b is not None:
            assert len(b) == fused._plane_rung_size(60, 64, k)
            sizes[k] = len(b)
    assert kind in fused._FAST_KINDS
    assert len(blob) == sizes[kind] == min(
        sizes[k] for k in sizes if k in fused._FAST_KINDS)


def test_coeff_wire_best_uniform_kind_collapses():
    """All planes agreeing on a rung yields the single-kind string, so the
    uniform compiled programs are reused."""
    rs = np.random.RandomState(13)
    planes = []
    for bh, bw in [(4, 6), (2, 3)]:
        c = np.zeros((bh, bw, 64), np.int16)
        c[..., 0] = rs.randint(-100, 100, (bh, bw))
        nz = rs.rand(bh, bw, 63) < 0.03
        c[..., 1:][nz] = rs.randint(-2, 3, int(nz.sum())).astype(np.int16)
        planes.append(c)
    blob, kind = fused.pack_coeff_wire_best(planes)
    assert "," not in kind          # tiny planes: the cap floors make the
    assert kind == "i16"            # dense terminal rung the smallest
    out = fused._unpack_coeff_wire_multi(
        jnp.asarray(np.frombuffer(blob, np.uint8)), ((4, 6), (2, 3)), kind)
    for c, o in zip(planes, out):
        np.testing.assert_array_equal(np.asarray(o), c.astype(np.int32))


def _gentle_base(max_delta: float, seed: int) -> np.ndarray:
    """(H, W) 10-bit codes whose 2D deltas stay within ±max_delta (plus a
    handful of rounding-step escapes) — per-rung wire test content."""
    yy, xx = np.mgrid[0:H, 0:W].astype(np.float32)
    a = max_delta * 0.9
    v = 500 + a * 57 * np.sin(xx / 57.0) + a * 43 * np.cos(yy / 43.0)
    return np.clip(v, 0, 1023).astype(np.uint32)


@pytest.mark.parametrize("bits", [2, 3, 4, 6])
def test_rgb_wire_roundtrip_1010102_all_rungs(bits):
    """Every RGBA1010102 ladder rung reconstructs the packed input
    exactly (fused._RGB_LADDERS now enters at 2 bits).  Content is
    scaled so its deltas fit the rung under test; overflow behavior is
    covered by the ladder fallback test below."""
    base = _gentle_base(2.0 ** (bits - 1) - 1, seed=43)
    p = np.ascontiguousarray(
        base | (base << 10) | ((1023 - base) << 20) | np.uint32(0x3) << 30)
    buf = fused.pack_rgb_wire(p, ImgFmt.RGBA1010102, bits)
    assert buf is not None
    out = fused._decode_rgb_wire(jnp.asarray(buf), H, W,
                                 ImgFmt.RGBA1010102, bits)
    np.testing.assert_array_equal(np.asarray(out), p)


@pytest.mark.parametrize("bits", [2, 4, 8])
def test_rgb_wire_roundtrip_f16_all_rungs(bits):
    """f16 rungs: values inside one exponent band (0.5..1) delta smoothly
    in bit-pattern space; the wire must reproduce the patterns exactly."""
    base = _gentle_base(2.0 ** (bits - 1) - 1, seed=44)
    comp = np.empty((H, W, 4), np.float16)
    # mantissa steps track the 10-bit base 1:1 inside [0.5, 1)
    comp[..., 0] = (0.5 + base.astype(np.float32) / 2048.0).astype(np.float16)
    comp[..., 1] = (0.5 + (1023 - base).astype(np.float32) / 2048.0
                    ).astype(np.float16)
    comp[..., 2] = (0.5 + base.astype(np.float32) / 4096.0).astype(np.float16)
    comp[..., 3] = np.float16(1.0)
    p = np.ascontiguousarray(comp).view(np.uint16)
    buf = fused.pack_rgb_wire(p, ImgFmt.RGBAF16, bits)
    assert buf is not None
    out = fused._decode_rgb_wire(jnp.asarray(buf), H, W,
                                 ImgFmt.RGBAF16, bits)
    np.testing.assert_array_equal(np.asarray(out), p)


def test_rgb_wire_ladder_fallback_on_sharp_content():
    """Content whose deltas overflow the 2-bit escapes must still encode
    byte-identically (rung-by-rung fallback inside encode_api0)."""
    rs = np.random.RandomState(7)
    r = rs.randint(0, 1024, (H, W)).astype(np.uint32)   # white noise
    g = rs.randint(0, 1024, (H, W)).astype(np.uint32)
    b = rs.randint(0, 1024, (H, W)).astype(np.uint32)
    p = r | (g << 10) | (b << 20) | np.uint32(0x3) << 30
    img = RawImage(ImgFmt.RGBA1010102, ColorGamut.BT2100, ColorTransfer.HLG,
                   ColorRange.FULL, W, H, [np.ascontiguousarray(p)])
    assert fused.pack_rgb_wire(p, ImgFmt.RGBA1010102, 2) is None
    jr = JpegR(map_dimension_scale_factor=2, use_multi_channel_gainmap=False,
               preset=EncPreset.REALTIME)
    blob = jr.encode_api0(img, quality=92)
    assert blob[:2] == b"\xff\xd8"


# ---------------------------------------------------------------------------
# Variable-width group wire ("vw", the round-5 default upload codec:
# jpeg_entropy.cpp uhdr_pack_vw + fused._vw_decode_planes)


def _vw_scene(h, w, seed=0, hot=True):
    """Mixed-entropy planes: smooth regions (w≈0-2 groups), grain
    (mid widths), and hot blocks driving groups to the max width."""
    rs = np.random.RandomState(seed)
    y = _smooth_plane(h, w, seed=seed)
    if hot:
        n = (y >> 6).astype(np.int32)
        n[h // 4::h // 3, :] = rs.randint(0, 1024, (len(n[h // 4::h // 3]),
                                                    w))
        y = (np.clip(n, 0, 1023).astype(np.uint16) << 6)
    u = _smooth_plane(h // 2, w // 2, seed=seed + 1, edges=False)
    v = _smooth_plane(h // 2, w // 2, seed=seed + 2)
    uv = np.empty((h // 2, w), np.uint16)
    uv[:, 0::2] = u
    uv[:, 1::2] = v
    return y, uv


@pytest.mark.smoke
@pytest.mark.parametrize("dims", [(H, W), (126, 94), (31, 50)])
def test_vw_wire_roundtrip(dims):
    h, w = dims
    y, uv = _vw_scene(h if h % 2 == 0 else h + 1, w if w % 2 == 0 else w)
    h, w = y.shape
    buf, mode = fused.pack_vw_wire(y, uv)
    assert buf is not None and mode[0] == "vw" and mode[1] == buf.size
    yd, uvd = fused._vw_decode_planes(jnp.asarray(buf), h, w)
    np.testing.assert_array_equal(np.asarray(yd), y & np.uint16(0xFFC0))
    np.testing.assert_array_equal(np.asarray(uvd), uv & np.uint16(0xFFC0))


@pytest.mark.smoke
def test_vw_wire_never_overflows_on_noise():
    # full-range noise defeats every fixed rung; vw must still fit (and
    # cost <= ~12.2 bits/sample + headers)
    rs = np.random.RandomState(3)
    y = (rs.randint(0, 1024, (H, W)).astype(np.uint16) << 6)
    uv = (rs.randint(0, 1024, (H // 2, W)).astype(np.uint16) << 6)
    buf, mode = fused.pack_vw_wire(y, uv)
    assert buf is not None
    yd, uvd = fused._vw_decode_planes(jnp.asarray(buf), H, W)
    np.testing.assert_array_equal(np.asarray(yd), y)
    np.testing.assert_array_equal(np.asarray(uvd), uv)


@pytest.mark.smoke
def test_vw_wire_flat_content_is_tiny():
    y = np.full((H, W), 512 << 6, np.uint16)
    uv = np.full((H // 2, W), 512 << 6, np.uint16)
    buf, _ = fused.pack_vw_wire(y, uv)
    gy, guv, wyw, wuvw = fused._vw_header_words(H, W)
    # all-zero groups: payload is empty, only the width headers (+ bucket
    # padding, which this assertion deliberately looks through)
    total = wyw + wuvw
    assert np.count_nonzero(buf[total:]) == 0
    yd, uvd = fused._vw_decode_planes(jnp.asarray(buf), H, W)
    np.testing.assert_array_equal(np.asarray(yd), y)


def test_vw_is_default_auto_mode(monkeypatch):
    monkeypatch.delenv("UHDR_TPU_WIRE", raising=False)
    y, uv = _vw_scene(H, W)
    buf, mode = fused._pack_wire_auto(y, uv)
    assert mode[0] == "vw"


def test_vw_encode_byte_identical_to_ladder(monkeypatch):
    """The wire is a pure transport: fused encode output bytes must not
    depend on which upload wire carried the input."""
    y, uv = _vw_scene(H, W, hot=False)
    img = RawImage(ImgFmt.P010, ColorGamut.BT2100, ColorTransfer.HLG,
                   ColorRange.FULL, W, H, [y, uv])
    jr = JpegR(map_dimension_scale_factor=4,
               use_multi_channel_gainmap=False, preset=EncPreset.REALTIME)
    monkeypatch.setenv("UHDR_TPU_WIRE", "vw")
    a = fused.encode_api0_p010_pipelined(jr, [img])[0]
    monkeypatch.setenv("UHDR_TPU_WIRE", "1d7")
    b = fused.encode_api0_p010_pipelined(jr, [img])[0]
    assert a == b


# --- per-channel vw wire (RGB inputs; pack_vw_chan -> _vw_decode_chan) ----


@pytest.mark.smoke
@pytest.mark.parametrize("dims", [(H, W), (31, 50)])
def test_vw_chan_roundtrip(dims):
    h, w = dims
    rs = np.random.RandomState(7)
    for name, ch in [
        ("smooth", (_smooth_plane(h, w, seed=4) >> 6)),
        ("noise10", rs.randint(0, 1024, (h, w)).astype(np.uint16)),
        ("zeros", np.zeros((h, w), np.uint16)),
        ("max", np.full((h, w), 1023, np.uint16)),
    ]:
        buf = fused.pack_vw_chan(ch)
        assert buf is not None, name
        out = np.asarray(fused._vw_decode_chan(jnp.asarray(buf), h, w))
        np.testing.assert_array_equal(out, ch, err_msg=name)


@pytest.mark.smoke
def test_vw_chan_rejects_wide_content():
    # 16-bit noise needs residual widths >12: the packer must refuse
    # (the encode path then falls to the escape ladder / raw upload)
    rs = np.random.RandomState(8)
    wide = rs.randint(0, 65536, (H, W)).astype(np.uint16)
    assert fused.pack_vw_chan(wide) is None


def test_rgb_vw_wire_byte_invisible_noisy_channels():
    """Photo-like RGB content whose channels overflow the fixed rung
    ladder rides the per-channel vw wire; the encode stays byte-identical
    to the raw upload path."""
    import unittest.mock as mock
    rs = np.random.RandomState(12)
    base = (np.cumsum(rs.randint(-3, 4, (H, W)), axis=1).cumsum(axis=0)
            % 512).astype(np.uint32)
    noisy = np.clip(base + rs.randint(-120, 121, (H, W)), 0,
                    1023).astype(np.uint32)
    p = np.ascontiguousarray(base | (noisy << 10) | ((1023 - base) << 20)
                             | np.uint32(0x3) << 30)
    img = RawImage(ImgFmt.RGBA1010102, ColorGamut.BT2100, ColorTransfer.HLG,
                   ColorRange.FULL, W, H, [p])
    chans, alpha = fused._split_rgb_channels(p, ImgFmt.RGBA1010102)
    assert all(fused.pack_vw_chan(c) is not None for c in chans)
    jr = JpegR(map_dimension_scale_factor=2, use_multi_channel_gainmap=False,
               preset=EncPreset.REALTIME)
    via_vw = jr.encode_api0(img, quality=92)
    with mock.patch.object(fused, "pack_vw_chan", lambda *a, **k: None), \
            mock.patch.object(fused, "pack_rgb_chan", lambda *a, **k: None):
        via_raw = jr.encode_api0(img, quality=92)
    assert via_vw == via_raw
