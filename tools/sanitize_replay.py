"""ASan/UBSan gate for the hand-written native code.

The reference hardens its C++ with `-fsanitize=` builds driven by its fuzz
corpus in CI (UHDR_SANITIZE_OPTIONS, /root/reference/docs/building.md:70;
.github/workflows/cmake_linux.yml:47-62).  This repo's equivalents are the
native entropy codec (jpeg/_native/jpeg_entropy.cpp), the fused host decode
engine (jpeg/_native/host_decode.cpp) and the C ABI shim
(capi/uhdr_capi.cpp).  This tool:

  1. re-execs itself with LD_PRELOAD=libasan + UHDR_TPU_SANITIZE=1 so the
     native codec builds and runs under `-fsanitize=address,undefined
     -fno-sanitize-recover=all` (a finding aborts the process — the test
     fails loudly);
  2. replays the ENTIRE committed fuzz corpus through the host-side parser
     + native-codec surfaces: segment scanner, ISO/XMP/ICC parsers, JPEG
     header parse, probe, sequential decode_scan, progressive scan decode,
     and the full native host-decode engine (decode_host);
  3. drives the encode-side natives (uhdr_encode_scan, stuff_scan,
     join_blocks, pack_delta7, pack_p010_10bit) with adversarial random
     inputs;
  4. builds the C ABI shim with the same sanitizers and runs the plain-C
     smoke flow against it (skipped when no embeddable libpython exists —
     same gate as tests/test_capi.py).

Constraint: jaxlib's prebuilt binaries throw C++ exceptions that ASan's
__cxa_throw interceptor cannot service under LD_PRELOAD (interceptor CHECK
abort), so the sanitized replay drives only jit-free code paths — which is
exactly the hand-written C++ under test; the jit paths contain no
first-party native code.

Exit 0 = no sanitizer findings.  Run: python tools/sanitize_replay.py
"""

from __future__ import annotations

import os
import pathlib
import subprocess
import sys

REPO = pathlib.Path(__file__).resolve().parent.parent


def find_libasan() -> str | None:
    try:
        p = subprocess.run(["g++", "-print-file-name=libasan.so"],
                           capture_output=True, text=True, check=True)
    except (OSError, subprocess.CalledProcessError):
        return None
    path = p.stdout.strip()
    return path if path and os.path.exists(path) else None


def reexec_sanitized() -> int:
    asan = find_libasan()
    if asan is None:
        print("SKIP: no libasan on this host")
        return 0
    env = dict(os.environ)
    env["LD_PRELOAD"] = os.path.realpath(asan)
    env["UHDR_TPU_SANITIZE"] = "1"
    # python itself leaks by design; UBSan findings + ASan memory errors
    # still abort via -fno-sanitize-recover=all
    env["ASAN_OPTIONS"] = "detect_leaks=0:abort_on_error=1"
    env["UBSAN_OPTIONS"] = "halt_on_error=1:abort_on_error=1"
    env["JAX_PLATFORMS"] = "cpu"
    env["_UHDR_SAN_CHILD"] = "1"
    return subprocess.run([sys.executable, os.path.abspath(__file__)],
                          env=env, cwd=REPO).returncode


# ---------------------------------------------------------------------------
# jit-free replay targets (native code under test; clean rejections pass)

def _decode_coeffs_native(data: bytes):
    """decode_to_planes' native front half: header parse + sequential or
    progressive coefficient decode, WITHOUT the jit IDCT."""
    import numpy as np
    from libultrahdr_tpu.jpeg import decoder as D

    info = D.parse_jpeg(data)
    if info.width * info.height > 512 * 512:
        return None
    D._validate(info)
    hmax = max(c.h for c in info.components)
    vmax = max(c.v for c in info.components)
    mcus_w = -(-info.width // (8 * hmax))
    mcus_h = -(-info.height // (8 * vmax))
    comps = [{"h": c.h, "v": c.v, "dc_tbl": c.dc_tbl, "ac_tbl": c.ac_tbl}
             for c in info.components]
    if info.progressive:
        return D._decode_progressive_coeffs(data, info, comps, mcus_w,
                                            mcus_h, hmax, vmax)
    from libultrahdr_tpu.jpeg import native
    dc = [info.dc_tables.get(i) for i in range(4)]
    ac = [info.ac_tables.get(i) for i in range(4)]
    return native.decode_scan(data[info.scan_offset:], comps, mcus_w,
                              mcus_h, dc, ac, info.restart_interval)


def _decode_host_native(data: bytes):
    """Full native host decode engine (host_decode.cpp) — Huffman + IDCT +
    apply in C++, no jit."""
    from libultrahdr_tpu.jpegr import JpegR
    from libultrahdr_tpu.types import ColorTransfer, ImgFmt
    return JpegR().decode_host(data, output_ct=ColorTransfer.HLG,
                               output_fmt=ImgFmt.RGBA1010102)


def replay_corpus() -> int:
    from fuzz.fuzz_parsers import CLEAN, CORPUS, TARGETS

    targets = dict(TARGETS)
    targets["jpeg_decode"] = _decode_coeffs_native
    targets["host_decode"] = _decode_host_native

    n = 0
    for name, target in targets.items():
        for cdir in sorted(CORPUS.iterdir()):
            if not cdir.is_dir():
                continue
            for f in sorted(cdir.iterdir()):
                data = f.read_bytes()
                # every target must survive every corpus entry
                # (cross-target replay widens coverage)
                try:
                    target(data)
                except CLEAN:
                    pass
                n += 1
    print(f"replayed {n} corpus-target pairs under ASan/UBSan")
    return n


def encode_natives() -> None:
    """Drive the encode-side natives with adversarial random inputs."""
    import numpy as np
    from libultrahdr_tpu.jpeg import native
    from libultrahdr_tpu.jpeg.tables import (AC_CHROMA, AC_LUMA, DC_CHROMA,
                                             DC_LUMA)

    rs = np.random.RandomState(11)
    dc_tables = [DC_LUMA, DC_CHROMA, None, None]
    ac_tables = [AC_LUMA, AC_CHROMA, None, None]
    for trial in range(8):
        mw, mh = int(rs.randint(1, 9)), int(rs.randint(1, 9))
        # extreme codable coefficients: AC full +-1023 swing, dense runs
        comps = []
        for ci, (hs, vs) in enumerate([(2, 2), (1, 1), (1, 1)]):
            c = rs.randint(-1023, 1024,
                           (mh * vs, mw * hs, 64)).astype(np.int16)
            if trial % 2:
                c[..., 1:] *= (rs.rand(*c[..., 1:].shape) < 0.1)
            comps.append({"coeffs": c, "h": hs, "v": vs,
                          "dc_tbl": min(ci, 1), "ac_tbl": min(ci, 1)})
        scan = native.encode_scan(comps, mw, mh, dc_tables, ac_tables,
                                  restart_interval=mw)
        assert len(scan) > 0

        # round-trip the scan through the native decoder bit-exactly
        dcomps = [{"h": c["h"], "v": c["v"], "dc_tbl": c["dc_tbl"],
                   "ac_tbl": c["ac_tbl"]} for c in comps]
        out, _ = native.decode_scan(scan, dcomps, mw, mh, dc_tables,
                                    ac_tables, mw)
        for arr, c in zip(out, comps):
            np.testing.assert_array_equal(np.asarray(arr), c["coeffs"])

        # out-of-range coefficients (AC magnitude 1024 needs category 11,
        # absent from baseline AC tables) must be REJECTED, not emitted as
        # a silently corrupt stream
        bad = [dict(comps[0]) | {"coeffs":
               np.full_like(comps[0]["coeffs"], -1024)}] + comps[1:]
        try:
            native.encode_scan(bad, mw, mh, dc_tables, ac_tables, mw)
            raise AssertionError("uncodable coefficients were accepted")
        except RuntimeError:
            pass

        plane = rs.randint(0, 1 << 16, (int(rs.randint(8, 64)),
                                        int(rs.randint(8, 64)) * 2)) \
            .astype(np.uint16)
        native.pack_p010_10bit(plane)
        native.pack_delta7(plane, uv_interleaved=False)
        native.pack_delta7(plane, uv_interleaved=True)
        # generalized wire modes (2D predictor, 2..8-bit codes) and the
        # decode-side coefficient slicer, including the escape-overflow
        # and padded-tail paths
        for two_d in (False, True):
            for bits in (2, 4, 5, 8):
                native.pack_delta7(plane, uv_interleaved=bool(bits & 1),
                                   two_d=two_d, bits=bits)
        flat = rs.randint(-1024, 1024,
                          int(rs.randint(1, 200))).astype(np.int16)
        for bits in (2, 4, 8):
            g = -(-flat.size // 32)
            words = np.empty((g, bits), np.uint32)
            ei = np.empty(64, np.int32)
            ev = np.empty(64, np.int16)
            native.pack_slices_into(flat, bits, words, ei, ev)
    print("encode-side natives clean")


def capi_sanitized() -> None:
    """Build the C ABI shim with sanitizers; the full C smoke test drives
    jit paths (encode/decode), which ASan cannot service with jaxlib (see
    module docstring), so this runs the build + load + marshaling-error
    paths via a tiny C program."""
    import sysconfig
    libdir = sysconfig.get_config_var("LIBDIR") or ""
    ldlib = sysconfig.get_config_var("LDLIBRARY") or ""
    if not (libdir and ldlib and
            (pathlib.Path(libdir) / ldlib).exists() and ".so" in ldlib):
        print("SKIP capi: no embeddable libpython")
        return
    env = dict(os.environ)
    env["UHDR_CAPI_SANITIZE"] = "1"
    env.pop("LD_PRELOAD", None)
    env.pop("UHDR_TPU_SANITIZE", None)
    code = ("import sys; sys.path.insert(0, 'capi'); "
            "from build import build_shim; print(build_shim())")
    r = subprocess.run([sys.executable, "-c", code], env=env, cwd=REPO,
                       capture_output=True, text=True)
    if r.returncode != 0:
        raise SystemExit(f"sanitized capi shim build failed:\n{r.stderr}")
    shim = r.stdout.strip().splitlines()[-1]
    # marshaling-error paths: null/invalid args through every entry point
    # family, no interpreter dispatch -> no jit
    src = REPO / "tools" / "_capi_asan_smoke.c"
    exe = pathlib.Path("/tmp/uhdr_capi_asan_smoke")
    subprocess.run(
        ["gcc", "-O1", "-g", "-fsanitize=address,undefined",
         "-fno-sanitize-recover=all", str(src), f"-I{REPO / 'capi'}",
         shim, f"-Wl,-rpath,{pathlib.Path(shim).parent}", "-o", str(exe)],
        check=True)
    env2 = dict(env)
    env2["ASAN_OPTIONS"] = "detect_leaks=0:abort_on_error=1"
    env2["PYTHONPATH"] = str(REPO)
    r2 = subprocess.run([str(exe)], env=env2)
    if r2.returncode != 0:
        raise SystemExit("sanitized capi smoke failed")
    print("sanitized capi shim: build + marshaling smoke clean")


def main() -> int:
    if os.environ.get("_UHDR_SAN_CHILD") != "1":
        return reexec_sanitized()
    sys.path.insert(0, str(REPO))
    import jax
    jax.config.update("jax_platforms", "cpu")
    replayed = replay_corpus()
    assert replayed > 0, "no corpus found"
    encode_natives()
    capi_sanitized()
    print("SANITIZE REPLAY OK")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
