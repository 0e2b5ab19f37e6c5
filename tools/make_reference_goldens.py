"""Generate hermetic reference-interop golden fixtures.

Runs the reference libuhdr.so (built at /tmp/refbuild, plus an XMP-only
variant at /tmp/refbuild_xmp) over a small deterministic scene across the
config axes the reference's own interop tests span
(/root/reference/tests/jpegr_test.cpp:1483-1558: gamut/channel/metadata
parameterization), and commits per-config .npz fixtures into
tests/goldens/ containing:

  - the raw input planes (so the test can re-encode the exact content),
  - the reference-encoded JPEG_R bytes,
  - the reference's own decode of those bytes (RGBA1010102 for HLG/PQ,
    RGBA F16 bit patterns for LINEAR),
  - the config as a JSON string.

tests/test_reference_goldens.py then asserts decode/encode parity against
these files unconditionally — no reference build needed at test time.

Usage: python tools/make_reference_goldens.py
"""

import ctypes
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from benchmarks import grainy_p010, _p010_to_rgba1010102, _p010_to_rgbaf16  # noqa: E402

OUT = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                   "tests", "goldens")
LIB_ISO = "/tmp/refbuild/libuhdr.so"
LIB_XMP = "/tmp/refbuild_xmp/libuhdr.so"

W, H = 256, 160  # divisible by every scale factor used below


class _RawImage(ctypes.Structure):
    _fields_ = [("fmt", ctypes.c_int), ("cg", ctypes.c_int),
                ("ct", ctypes.c_int), ("range", ctypes.c_int),
                ("w", ctypes.c_uint), ("h", ctypes.c_uint),
                ("planes", ctypes.c_void_p * 3),
                ("stride", ctypes.c_uint * 3)]


class _Compressed(ctypes.Structure):
    _fields_ = [("data", ctypes.c_void_p), ("data_sz", ctypes.c_size_t),
                ("capacity", ctypes.c_size_t), ("cg", ctypes.c_int),
                ("ct", ctypes.c_int), ("range", ctypes.c_int)]


class _ErrorInfo(ctypes.Structure):
    _fields_ = [("error_code", ctypes.c_int), ("has_detail", ctypes.c_int),
                ("detail", ctypes.c_char * 256)]


def _bind(path):
    lib = ctypes.CDLL(path)
    lib.uhdr_create_encoder.restype = ctypes.c_void_p
    lib.uhdr_create_decoder.restype = ctypes.c_void_p
    for name, argtypes in [
        ("uhdr_enc_set_raw_image", [ctypes.c_void_p, ctypes.POINTER(_RawImage), ctypes.c_int]),
        ("uhdr_enc_set_quality", [ctypes.c_void_p, ctypes.c_int, ctypes.c_int]),
        ("uhdr_enc_set_using_multi_channel_gainmap", [ctypes.c_void_p, ctypes.c_int]),
        ("uhdr_enc_set_gainmap_scale_factor", [ctypes.c_void_p, ctypes.c_int]),
        ("uhdr_enc_set_gainmap_gamma", [ctypes.c_void_p, ctypes.c_float]),
        ("uhdr_enc_set_preset", [ctypes.c_void_p, ctypes.c_int]),
        ("uhdr_encode", [ctypes.c_void_p]),
        ("uhdr_dec_set_image", [ctypes.c_void_p, ctypes.POINTER(_Compressed)]),
        ("uhdr_dec_set_out_color_transfer", [ctypes.c_void_p, ctypes.c_int]),
        ("uhdr_dec_set_out_img_format", [ctypes.c_void_p, ctypes.c_int]),
        ("uhdr_decode", [ctypes.c_void_p]),
        ("uhdr_add_effect_mirror", [ctypes.c_void_p, ctypes.c_int]),
        ("uhdr_add_effect_rotate", [ctypes.c_void_p, ctypes.c_int]),
        ("uhdr_add_effect_crop", [ctypes.c_void_p, ctypes.c_int,
                                  ctypes.c_int, ctypes.c_int, ctypes.c_int]),
        ("uhdr_add_effect_resize", [ctypes.c_void_p, ctypes.c_int,
                                    ctypes.c_int]),
    ]:
        fn = getattr(lib, name)
        fn.restype = _ErrorInfo
        fn.argtypes = argtypes
    lib.uhdr_get_encoded_stream.restype = ctypes.POINTER(_Compressed)
    lib.uhdr_get_encoded_stream.argtypes = [ctypes.c_void_p]
    lib.uhdr_get_decoded_image.restype = ctypes.POINTER(_RawImage)
    lib.uhdr_get_decoded_image.argtypes = [ctypes.c_void_p]
    lib.uhdr_release_encoder.argtypes = [ctypes.c_void_p]
    lib.uhdr_release_decoder.argtypes = [ctypes.c_void_p]
    return lib


def _ck(err, what):
    assert err.error_code == 0, f"{what}: code={err.error_code} {err.detail}"


def _ref_encode(lib, planes, fmt, ct, cg, rng, cfg):
    enc = lib.uhdr_create_encoder()
    img = _RawImage()
    img.fmt, img.cg, img.ct, img.range = fmt, cg, ct, rng
    img.w, img.h = W, H
    strides = {0: (W, W, 0), 1: (W, W // 2, W // 2), 4: (W, 0, 0), 5: (W, 0, 0)}[fmt]
    for i, p in enumerate(planes):
        img.planes[i] = p.ctypes.data
        img.stride[i] = strides[i]
    _ck(lib.uhdr_enc_set_raw_image(enc, ctypes.byref(img), 0), "set_raw")
    _ck(lib.uhdr_enc_set_quality(enc, cfg["quality"], 2), "q base")
    _ck(lib.uhdr_enc_set_quality(enc, cfg["map_quality"], 3), "q map")
    _ck(lib.uhdr_enc_set_using_multi_channel_gainmap(enc, int(cfg["multi"])), "multi")
    _ck(lib.uhdr_enc_set_gainmap_scale_factor(enc, cfg["scale"]), "scale")
    _ck(lib.uhdr_enc_set_gainmap_gamma(enc, cfg["gamma"]), "gamma")
    _ck(lib.uhdr_enc_set_preset(enc, cfg["preset"]), "preset")
    _ck(lib.uhdr_encode(enc), "encode")
    out = lib.uhdr_get_encoded_stream(enc).contents
    data = ctypes.string_at(out.data, out.data_sz)
    lib.uhdr_release_encoder(enc)
    return data


def _ref_decode(lib, data, ct, fmt, effects=()):
    dec = lib.uhdr_create_decoder()
    buf = ctypes.create_string_buffer(data, len(data))
    comp = _Compressed(ctypes.cast(buf, ctypes.c_void_p), len(data),
                       len(data), -1, -1, -1)
    _ck(lib.uhdr_dec_set_image(dec, ctypes.byref(comp)), "dec set")
    _ck(lib.uhdr_dec_set_out_color_transfer(dec, ct), "dec ct")
    _ck(lib.uhdr_dec_set_out_img_format(dec, fmt), "dec fmt")
    for kind, args in effects:
        fn = getattr(lib, f"uhdr_add_effect_{kind}")
        _ck(fn(dec, *args), f"effect {kind}")
    _ck(lib.uhdr_decode(dec), "decode")
    img = lib.uhdr_get_decoded_image(dec).contents
    bpp = 8 if fmt == 4 else 4
    rows = [np.frombuffer(ctypes.string_at(img.planes[0] + bpp * img.stride[0] * r,
                                           bpp * img.w), np.uint8)
            for r in range(img.h)]
    out = np.stack(rows)
    if fmt == 4:       # RGBA F16 bit patterns
        out = out.view(np.uint16).reshape(img.h, img.w, 4)
    else:              # RGBA1010102 / RGBA8888 packed words
        out = out.view(np.uint32).reshape(img.h, img.w)
    lib.uhdr_release_decoder(dec)
    return np.ascontiguousarray(out)


def main():
    os.makedirs(OUT, exist_ok=True)
    iso = _bind(LIB_ISO)
    xmp = _bind(LIB_XMP)

    base = grainy_p010(W, H, seed=23)
    rgba10 = _p010_to_rgba1010102(base)
    f16 = _p010_to_rgbaf16(base)

    # (name, lib, input image, reference fmt/ct enums, config)
    # uhdr enums: fmt p010=0 yuv420=1 f16=4 rgba1010102=5; ct linear=0 hlg=1
    # pq=2 srgb=3; cg 709=0 p3=1 2100=2; range limited=0 full=1;
    # preset realtime=0 best=1.
    cfgs = [
        ("p010_iso_single_s4", iso, "iso", base, 0, 1, 2, 1,
         dict(quality=95, map_quality=85, multi=False, scale=4, gamma=1.0, preset=1)),
        ("p010_iso_multi_s1", iso, "iso", base, 0, 1, 2, 1,
         dict(quality=95, map_quality=95, multi=True, scale=1, gamma=1.0, preset=1)),
        ("p010_iso_single_s4_q90", iso, "iso", base, 0, 1, 2, 1,
         dict(quality=90, map_quality=85, multi=False, scale=4, gamma=1.0, preset=0)),
        ("p010_iso_multi_s2_gamma", iso, "iso", base, 0, 1, 2, 1,
         dict(quality=95, map_quality=95, multi=True, scale=2, gamma=1.571, preset=1)),
        ("rgba1010102_iso_multi_s2", iso, "iso", rgba10, 5, 1, 2, 1,
         dict(quality=95, map_quality=95, multi=True, scale=2, gamma=1.0, preset=1)),
        ("rgbaf16_iso_single_s4", iso, "iso", f16, 4, 0, 2, 1,
         dict(quality=95, map_quality=85, multi=False, scale=4, gamma=1.0, preset=1)),
        ("p010_xmp_single_s4", xmp, "xmp", base, 0, 1, 2, 1,
         dict(quality=95, map_quality=85, multi=False, scale=4, gamma=1.0, preset=1)),
    ]

    # decode-side effect parity rasters (tests/editorhelper_test.cpp role:
    # rotate/mirror/crop/resize validated against reference-produced
    # pixels; lib/src/editorhelper.cpp:100-146 bicubic, 210-483 apply_*).
    # Applied post-decode through the reference decoder's effect queue
    # (ultrahdr_api.cpp:275-415), captured for SRGB/8888 and HLG/1010102.
    effect_cfgs = [
        ("rot90", [("rotate", (90,))]),
        ("rot180", [("rotate", (180,))]),
        ("rot270", [("rotate", (270,))]),
        ("mirror_v", [("mirror", (0,))]),
        ("mirror_h", [("mirror", (1,))]),
        ("crop", [("crop", (16, 240, 8, 152))]),
        ("resize_half", [("resize", (128, 80))]),
        ("resize_odd", [("resize", (100, 60))]),
        ("rot90_mirror_h", [("rotate", (90,)), ("mirror", (1,))]),
    ]
    eff_cfg = dict(quality=95, map_quality=85, multi=False, scale=4,
                   gamma=1.0, preset=1)
    planes = [np.ascontiguousarray(p) for p in base.planes]
    data = _ref_encode(iso, planes, 0, 1, 2, 1, eff_cfg)
    entry = {"jpegr": np.frombuffer(data, np.uint8),
             "config": np.frombuffer(json.dumps(
                 dict(eff_cfg, fmt=0, ct=1, cg=2, range=1, w=W, h=H,
                      effects=[(n, e) for n, e in effect_cfgs])).encode(),
                 np.uint8)}
    for name, effs in effect_cfgs:
        entry[f"{name}_srgb"] = _ref_decode(iso, data, 3, 3, effs)
        entry[f"{name}_hlg"] = _ref_decode(iso, data, 1, 5, effs)
    path = os.path.join(OUT, "effects_p010_iso_single_s4.npz")
    np.savez_compressed(path, **entry)
    print(f"effects fixture: {len(effect_cfgs)} configs, "
          f"npz={os.path.getsize(path)}B")

    for name, lib, meta_kind, img, fmt, ct, cg, rng, cfg in cfgs:
        if (os.path.exists(os.path.join(OUT, f"{name}.npz"))
                and "--force" not in sys.argv):
            print(f"{name}: exists, skipping (--force regenerates)")
            continue
        planes = [np.ascontiguousarray(p) for p in img.planes]
        data = _ref_encode(lib, planes, fmt, ct, cg, rng, cfg)
        entry = {
            "jpegr": np.frombuffer(data, np.uint8),
            "config": np.frombuffer(json.dumps(
                dict(cfg, fmt=fmt, ct=ct, cg=cg, range=rng, w=W, h=H,
                     metadata=meta_kind)).encode(), np.uint8),
            "dec_hlg_1010102": _ref_decode(lib, data, 1, 5),
            "dec_pq_1010102": _ref_decode(lib, data, 2, 5),
            "dec_linear_f16": _ref_decode(lib, data, 0, 4),
            "dec_srgb_8888": _ref_decode(lib, data, 3, 3),
        }
        for i, p in enumerate(planes):
            entry[f"in_plane{i}"] = p
        path = os.path.join(OUT, f"{name}.npz")
        np.savez_compressed(path, **entry)
        print(f"{name}: jpegr={len(data)}B npz={os.path.getsize(path)}B")


if __name__ == "__main__":
    main()
