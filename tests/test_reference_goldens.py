"""Hermetic interop parity against committed reference-binary goldens.

tests/goldens/*.npz were produced ONCE by tools/make_reference_goldens.py
running the real libuhdr.so (see that script); each carries the raw input,
the reference-encoded JPEG_R bytes, and the reference's own decodes.  These
tests therefore anchor our decoder and encoder to the reference WITHOUT
needing a reference build at test time — the analog of the reference's own
fixture strategy (/root/reference/tests/jpegr_test.cpp:1440-1494).

Gates:
  - decode parity: our decode of the reference-encoded bytes vs the
    reference's decode of the same bytes — >= 60 dB on every output
    format (same bitstream, two decoders).
  - encode parity: our encode of the identical raw input, decoded by our
    own decoder, vs the reference's decoded raster — both encoders are
    lossy (JPEG q95 + gainmap quantization) so the gate is the measured
    cross-encoder floor with margin (>= 48 dB; measured 54.9-60.6), plus
    a self-consistency gate: our-encode/our-decode must be within a few
    dB of ref-encode/our-decode.
"""

import glob
import json
import os

import numpy as np
import pytest

GOLDENS = os.path.join(os.path.dirname(__file__), "goldens")
NAMES = sorted(os.path.splitext(os.path.basename(p))[0]
               for p in glob.glob(os.path.join(GOLDENS, "*.npz"))
               if not os.path.basename(p).startswith("effects_"))

assert NAMES, "tests/goldens/*.npz missing from the checkout"


def _load(name):
    z = np.load(os.path.join(GOLDENS, name + ".npz"))
    cfg = json.loads(bytes(z["config"]).decode())
    return z, cfg


def _psnr_1010102(a, b):
    mse = np.mean([np.mean((((a >> s) & 0x3FF).astype(np.float64)
                            - ((b >> s) & 0x3FF).astype(np.float64)) ** 2)
                   for s in (0, 10, 20)])
    return 10 * np.log10(1023.0 ** 2 / max(mse, 1e-12))


def _psnr_8888(a, b):
    mse = np.mean([np.mean((((a >> s) & 0xFF).astype(np.float64)
                            - ((b >> s) & 0xFF).astype(np.float64)) ** 2)
                   for s in (0, 8, 16)])
    return 10 * np.log10(255.0 ** 2 / max(mse, 1e-12))


def _psnr_f16(a, b):
    fa = a.view(np.float16)[..., :3].astype(np.float64)
    fb = b.view(np.float16)[..., :3].astype(np.float64)
    peak = 10000.0 / 203.0
    mse = np.mean((fa - fb) ** 2)
    return 10 * np.log10(peak ** 2 / max(mse, 1e-12))


def _input_image(z, cfg):
    from libultrahdr_tpu.types import (ColorGamut, ColorRange, ColorTransfer,
                                       ImgFmt, RawImage)
    fmt = {0: ImgFmt.P010, 4: ImgFmt.RGBAF16, 5: ImgFmt.RGBA1010102}[cfg["fmt"]]
    ct = {0: ColorTransfer.LINEAR, 1: ColorTransfer.HLG,
          2: ColorTransfer.PQ}[cfg["ct"]]
    planes = [z[k] for k in sorted(z.files) if k.startswith("in_plane")]
    if fmt == ImgFmt.RGBA1010102:
        planes = [p.view(np.uint32) if p.dtype != np.uint32 else p
                  for p in planes]
    return RawImage(fmt, ColorGamut.BT2100, ct, ColorRange.FULL,
                    cfg["w"], cfg["h"], planes)


@pytest.mark.parametrize("name", NAMES)
def test_decode_parity_hlg(name):
    from libultrahdr_tpu.jpegr import JpegR, is_uhdr_image
    from libultrahdr_tpu.types import ColorTransfer
    z, cfg = _load(name)
    data = bytes(z["jpegr"])
    assert is_uhdr_image(data)
    ours = np.asarray(JpegR().decode(
        data, output_ct=ColorTransfer.HLG)[0].planes[0])
    psnr = _psnr_1010102(ours, z["dec_hlg_1010102"])
    assert psnr >= 60.0, f"{name}: HLG cross-decoder PSNR {psnr:.2f} dB"


@pytest.mark.parametrize("name", NAMES)
def test_decode_parity_pq(name):
    from libultrahdr_tpu.jpegr import JpegR
    from libultrahdr_tpu.types import ColorTransfer
    z, cfg = _load(name)
    ours = np.asarray(JpegR().decode(
        bytes(z["jpegr"]), output_ct=ColorTransfer.PQ)[0].planes[0])
    psnr = _psnr_1010102(ours, z["dec_pq_1010102"])
    assert psnr >= 60.0, f"{name}: PQ cross-decoder PSNR {psnr:.2f} dB"


@pytest.mark.parametrize("name", NAMES)
def test_decode_parity_linear(name):
    from libultrahdr_tpu.jpegr import JpegR
    from libultrahdr_tpu.types import ColorTransfer, ImgFmt
    z, cfg = _load(name)
    ours = np.asarray(JpegR().decode(
        bytes(z["jpegr"]), output_ct=ColorTransfer.LINEAR,
        output_fmt=ImgFmt.RGBAF16)[0].planes[0])
    psnr = _psnr_f16(ours, z["dec_linear_f16"])
    assert psnr >= 60.0, f"{name}: LINEAR cross-decoder PSNR {psnr:.2f} dB"


@pytest.mark.parametrize("name", NAMES)
def test_decode_parity_srgb(name):
    from libultrahdr_tpu.jpegr import JpegR
    from libultrahdr_tpu.types import ColorTransfer, ImgFmt
    z, cfg = _load(name)
    ours = np.asarray(JpegR().decode(
        bytes(z["jpegr"]), output_ct=ColorTransfer.SRGB,
        output_fmt=ImgFmt.RGBA8888)[0].planes[0])
    psnr = _psnr_8888(ours, z["dec_srgb_8888"])
    # bit-exact now: islow IDCT + fancy upsample + jdcolor fixed point
    assert psnr >= 60.0, f"{name}: SRGB cross-decoder PSNR {psnr:.2f} dB"


@pytest.mark.parametrize("name", NAMES)
def test_encode_parity(name):
    """Encode the committed raw input with OUR encoder at the reference's
    config; decode with OUR decoder; compare to the reference's decode of
    ITS OWN encode.  Cross-encoder: both sides lose independently."""
    from libultrahdr_tpu.jpegr import JpegR, is_uhdr_image
    from libultrahdr_tpu.types import ColorTransfer, EncPreset
    z, cfg = _load(name)
    img = _input_image(z, cfg)
    jr = JpegR(map_dimension_scale_factor=cfg["scale"],
               map_compress_quality=cfg["map_quality"],
               use_multi_channel_gainmap=cfg["multi"],
               gamma=cfg["gamma"],
               preset=EncPreset(cfg["preset"]),
               write_iso=cfg["metadata"] == "iso",
               write_xmp=cfg["metadata"] == "xmp")
    data = jr.encode_api0(img, quality=cfg["quality"])
    assert is_uhdr_image(data)
    dec = JpegR()
    ours = np.asarray(dec.decode(
        data, output_ct=ColorTransfer.HLG)[0].planes[0])
    cross = _psnr_1010102(ours, z["dec_hlg_1010102"])
    # self-consistency anchor: reference bytes through OUR decoder
    ref_via_ours = np.asarray(dec.decode(
        bytes(z["jpegr"]), output_ct=ColorTransfer.HLG)[0].planes[0])
    anchor = _psnr_1010102(ref_via_ours, z["dec_hlg_1010102"])
    # measured cross-encoder floor after the hlgOotfApprox fix: 54.3 dB
    # (both encoders lose independently at JPEG q95 + gainmap quantize)
    assert cross >= 48.0, f"{name}: cross-encoder PSNR {cross:.2f} dB"
    # The anchor is ~102 dB now that the base decode is bit-exact libjpeg
    # islow, so cap it at the lossy-encode regime before the relative gate
    # (cross-encoder loss can never be less than each encoder's own loss).
    assert cross >= min(anchor, 60.0) - 12.0, (
        f"{name}: our encode loses {anchor - cross:.2f} dB vs the "
        f"reference encode through the same decoder")


def test_xmp_and_iso_goldens_both_present():
    kinds = {json.loads(bytes(np.load(os.path.join(GOLDENS, n + ".npz"))
                              ["config"]).decode())["metadata"]
             for n in NAMES}
    assert kinds == {"iso", "xmp"}


# ---------------------------------------------------------------------------
# Editor pixel parity vs reference-produced effect rasters
# (tests/editorhelper_test.cpp role: rotate/mirror/crop/resize validated
# against expected output buffers; lib/src/editorhelper.cpp:100-146 bicubic,
# ultrahdr_api.cpp:275-415 decode-side effect queue).

_EFFECTS_NPZ = os.path.join(GOLDENS, "effects_p010_iso_single_s4.npz")
_EFFECT_NAMES = ["rot90", "rot180", "rot270", "mirror_v", "mirror_h",
                 "crop", "resize_half", "resize_odd", "rot90_mirror_h"]


def _queue_effects(dec, name):
    cfg = {
        "rot90": [("rotate", (90,))],
        "rot180": [("rotate", (180,))],
        "rot270": [("rotate", (270,))],
        "mirror_v": [("mirror", (0,))],
        "mirror_h": [("mirror", (1,))],
        "crop": [("crop", (16, 240, 8, 152))],
        "resize_half": [("resize", (128, 80))],
        "resize_odd": [("resize", (100, 60))],
        "rot90_mirror_h": [("rotate", (90,)), ("mirror", (1,))],
    }[name]
    for kind, args in cfg:
        getattr(dec, f"add_effect_{kind}")(*args)


def _decode_with_effects(data, name, ct, fmt):
    from libultrahdr_tpu.api import UhdrDecoder
    dec = UhdrDecoder()
    dec.set_image(data)
    dec.set_out_color_transfer(ct)
    dec.set_out_img_format(fmt)
    _queue_effects(dec, name)
    return np.asarray(dec.decode().planes[0])


@pytest.mark.skipif(not os.path.exists(_EFFECTS_NPZ),
                    reason="effects golden fixture missing")
@pytest.mark.parametrize("name", _EFFECT_NAMES)
def test_effect_parity_srgb(name):
    """SRGB path: decode is bit-exact to libjpeg, and rotate/mirror/crop
    are pure index permutations — these must match the reference's pixels
    EXACTLY; resize (float bicubic) gets a >=50 dB gate."""
    from libultrahdr_tpu.types import ColorTransfer, ImgFmt
    z = np.load(_EFFECTS_NPZ)
    ours = _decode_with_effects(bytes(z["jpegr"]), name,
                                ColorTransfer.SRGB, ImgFmt.RGBA8888)
    ref = z[f"{name}_srgb"]
    assert ours.shape == ref.shape, (ours.shape, ref.shape)
    if "resize" in name:
        assert _psnr_8888(ours, ref) >= 50.0
    else:
        np.testing.assert_array_equal(ours, ref)


@pytest.mark.skipif(not os.path.exists(_EFFECTS_NPZ),
                    reason="effects golden fixture missing")
@pytest.mark.parametrize("name", _EFFECT_NAMES)
def test_effect_parity_hlg(name):
    """HLG/1010102 path: two decoders (>=60 dB contract) + the effect;
    permutation effects keep the 60 dB floor, resize gets 50 dB (bicubic
    on split channels both sides, float rounding differs)."""
    from libultrahdr_tpu.types import ColorTransfer, ImgFmt
    z = np.load(_EFFECTS_NPZ)
    ours = _decode_with_effects(bytes(z["jpegr"]), name,
                                ColorTransfer.HLG, ImgFmt.RGBA1010102)
    ref = z[f"{name}_hlg"]
    assert ours.shape == ref.shape, (ours.shape, ref.shape)
    gate = 50.0 if "resize" in name else 60.0
    assert _psnr_1010102(ours, ref) >= gate
