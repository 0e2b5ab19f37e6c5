"""Coverage-guided mutation fuzzer for the byte-stream parsers.

The TPU-native counterpart of the reference's libFuzzer targets
(/root/reference/fuzzer/ultrahdr_dec_fuzzer.cpp:31-60, ultrahdr_enc_fuzzer
and the legacy target) and its OSS-Fuzz integration (fuzzer/ossfuzz.sh):
the hand-written segment scanner / ISO 21496-1 / XMP / ICC / JPEG-header /
Huffman parsers are exactly the code class where guided fuzzing finds
crashes, so this driver implements the AFL loop in-process:

  * line coverage collected per exec via sys.monitoring (PEP 669), scoped
    to libultrahdr_tpu modules;
  * a corpus (fuzz/corpus/<target>/) of inputs that each exercise new
    coverage, seeded from valid JPEG_R streams and their sub-blobs;
  * deterministic mutation stack (bit flips, byte ops, truncation, splice,
    interesting values, length-field +-1) keyed off a seeded RNG;
  * any exception that is not a clean coded failure (UhdrError or the
    narrow ValueError/KeyError family the parsers are specified to raise)
    is a CRASH, written to fuzz/crashes/ for reproduction.

Run standalone:   python fuzz/fuzz_parsers.py [--target NAME] [--execs N]
CI-budget run:    tests/test_fuzz_guided.py (bounded execs, asserts clean)
"""

from __future__ import annotations

import argparse
import hashlib
import os
import pathlib
import sys

HERE = pathlib.Path(__file__).resolve().parent
REPO = HERE.parent
sys.path.insert(0, str(REPO))

os.environ["JAX_PLATFORMS"] = "cpu"
# sitecustomize may pre-register the TPU plugin and pin the axon
# backend; force CPU through jax.config too (same mechanism as
# tests/conftest.py) so fuzzing never touches — or hangs on — the
# real device/tunnel
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402

from libultrahdr_tpu.errors import UhdrError  # noqa: E402

# exceptions that count as clean, coded rejections (parsers are specified
# to fail with UhdrError; struct-level helpers may surface ValueError)
CLEAN = (UhdrError, ValueError)

CORPUS = HERE / "corpus"
CRASHES = HERE / "crashes"


# ---------------------------------------------------------------------------
# targets: each takes bytes, returns anything, raises CLEAN on bad input

def target_scan(data: bytes):
    from libultrahdr_tpu.container.segments import scan_jpeg_images
    return scan_jpeg_images(data)


def target_iso(data: bytes):
    from libultrahdr_tpu.container.iso21496 import decode_gainmap_metadata
    return decode_gainmap_metadata(data)


def target_xmp(data: bytes):
    from libultrahdr_tpu.container.xmp import parse_xmp_metadata
    return parse_xmp_metadata(data)


def target_icc(data: bytes):
    from libultrahdr_tpu.container.icc import read_icc_color_gamut
    return read_icc_color_gamut(data)


def target_jpeg_parse(data: bytes):
    from libultrahdr_tpu.jpeg.decoder import parse_jpeg
    return parse_jpeg(data, parse_only=True)


def target_jpeg_decode(data: bytes):
    """Full JPEG header parse + host Huffman entropy decode (bounded dims
    so the fuzzer stays fast)."""
    from libultrahdr_tpu.jpeg.decoder import decode_to_planes, parse_jpeg
    info = parse_jpeg(data)
    if info.width * info.height > 512 * 512:
        return None
    return decode_to_planes(data, info)


def target_probe(data: bytes):
    """uhdr probe (the reference dec fuzzer's first stage)."""
    from libultrahdr_tpu.jpegr import JpegR, is_uhdr_image
    is_uhdr_image(data)
    return JpegR().get_info(data)


TARGETS = {
    "scan": target_scan,
    "iso": target_iso,
    "xmp": target_xmp,
    "icc": target_icc,
    "jpeg_parse": target_jpeg_parse,
    "jpeg_decode": target_jpeg_decode,
    "probe": target_probe,
}


# ---------------------------------------------------------------------------
# seeds

def make_seeds(target: str) -> list[bytes]:
    """Valid inputs per target, generated in-process (no checked-in
    binaries needed; the corpus dir accumulates interesting mutants)."""
    from libultrahdr_tpu.container import icc as icc_mod
    from libultrahdr_tpu.container import iso21496, xmp
    from libultrahdr_tpu.types import (ColorGamut, ColorRange, ColorTransfer,
                                       GainMapMetadata, ImgFmt, RawImage)

    md = GainMapMetadata()
    md.max_content_boost[:] = (4.0, 3.0, 5.0)
    md.min_content_boost[:] = 1.0
    md.gamma[:] = 1.0
    md.offset_sdr[:] = 1.0 / 64
    md.offset_hdr[:] = 1.0 / 64
    md.hdr_capacity_min, md.hdr_capacity_max = 1.0, 4.926

    if target == "iso":
        seeds = []
        for mc in (False, True):
            for b in (False, True):
                md.use_base_cg = b
                if not mc:
                    md.max_content_boost[:] = 4.0
                frac = iso21496.float_to_fraction(md)
                seeds.append(iso21496.encode_gainmap_metadata(frac))
        return seeds
    if target == "xmp":
        return [xmp.generate_xmp_for_secondary_image(md).encode(),
                xmp.generate_xmp_for_primary_image(1234, md).encode()]
    if target == "icc":
        return [icc_mod.write_icc_profile(ct, cg)
                for ct in (ColorTransfer.SRGB, ColorTransfer.HLG,
                           ColorTransfer.PQ, ColorTransfer.LINEAR)
                for cg in (ColorGamut.BT709, ColorGamut.DISPLAY_P3,
                           ColorGamut.BT2100)]

    # stream-level targets seed from a real encoded JPEG_R file
    from libultrahdr_tpu.jpegr import JpegR
    rs = np.random.RandomState(7)
    w, h = 96, 48
    y = (rs.randint(0, 1024, (h, w)).astype(np.uint16) << 6)
    uv = (rs.randint(0, 1024, (h // 2, w)).astype(np.uint16) << 6)
    img = RawImage(ImgFmt.P010, ColorGamut.BT2100, ColorTransfer.HLG,
                   ColorRange.FULL, w, h, [y, uv])
    jr = JpegR(map_dimension_scale_factor=2)
    stream = jr.encode_api0(img, quality=85)
    seeds = [stream]
    if target in ("jpeg_parse", "jpeg_decode"):
        from libultrahdr_tpu.container.segments import scan_jpeg_images
        seeds = [stream[a:b] for a, b in scan_jpeg_images(stream)]
    return seeds


# ---------------------------------------------------------------------------
# coverage via sys.monitoring (PEP 669)

_TOOL = 3  # sys.monitoring tool id (0=debugger, 1=coverage, 2=profiler)


class Coverage:
    def __init__(self):
        self.seen: set[tuple[int, int]] = set()
        self.current: set[tuple[int, int]] = set()
        self._pkg = str(REPO / "libultrahdr_tpu")
        mon = sys.monitoring
        mon.use_tool_id(_TOOL, "uhdr-fuzz")
        mon.register_callback(_TOOL, mon.events.LINE, self._on_line)

    def _on_line(self, code, line):
        if code.co_filename.startswith(self._pkg):
            self.current.add((id(code), line))
        else:
            return sys.monitoring.DISABLE  # stop monitoring foreign code

    def run(self, fn, data: bytes):
        """Execute fn(data) under line monitoring; returns (new_cov, exc)."""
        mon = sys.monitoring
        self.current = set()
        mon.set_events(_TOOL, mon.events.LINE)
        try:
            fn(data)
            exc = None
        except CLEAN:
            exc = None
        except Exception as e:  # noqa: BLE001 — crash triage is the point
            exc = e
        finally:
            mon.set_events(_TOOL, 0)
            mon.restart_events()
        new = self.current - self.seen
        self.seen |= self.current
        return bool(new), exc


# ---------------------------------------------------------------------------
# mutations

_INTERESTING = [0, 1, 0x7F, 0x80, 0xFF, 0xD8, 0xD9, 0xDA, 0xE0, 0xE1, 0xE2]


def mutate(rs: np.random.RandomState, corpus: list[bytes]) -> bytes:
    base = bytearray(corpus[rs.randint(len(corpus))])
    if not base:
        return rs.bytes(rs.randint(1, 64))
    for _ in range(rs.randint(1, 5)):
        op = rs.randint(7)
        if op == 0:                                   # bit flip
            p = rs.randint(len(base))
            base[p] ^= 1 << rs.randint(8)
        elif op == 1:                                 # interesting byte
            base[rs.randint(len(base))] = _INTERESTING[
                rs.randint(len(_INTERESTING))]
        elif op == 2:                                 # truncate
            base = base[:rs.randint(1, len(base) + 1)]
        elif op == 3:                                 # splice random blob
            p = rs.randint(len(base) + 1)
            base = base[:p] + bytearray(rs.bytes(rs.randint(1, 32))) + base[p:]
        elif op == 4:                                 # delete span
            if len(base) > 4:
                p = rs.randint(len(base) - 2)
                base = base[:p] + base[p + rs.randint(1, min(16, len(base) - p)):]
        elif op == 5 and len(base) >= 2:              # 16-bit length +-1
            p = rs.randint(len(base) - 1)
            v = (base[p] << 8) | base[p + 1]
            v = (v + rs.choice([-1, 1, 0x100, -0x100])) & 0xFFFF
            base[p], base[p + 1] = v >> 8, v & 0xFF
        elif op == 6 and len(corpus) > 1:             # cross-corpus splice
            other = corpus[rs.randint(len(corpus))]
            if other:
                p = rs.randint(len(base) + 1)
                q0 = rs.randint(len(other))
                q1 = min(len(other), q0 + rs.randint(1, 64))
                base = base[:p] + bytearray(other[q0:q1]) + base[p:]
    return bytes(base)


# ---------------------------------------------------------------------------

def fuzz_target(name: str, execs: int, seed: int = 0,
                save_corpus: bool = True) -> list[tuple[bytes, Exception]]:
    fn = TARGETS[name]
    rs = np.random.RandomState(seed)
    corpus_dir = CORPUS / name
    corpus = make_seeds(name)
    if corpus_dir.is_dir():
        for f in sorted(corpus_dir.iterdir()):
            corpus.append(f.read_bytes())

    cov = Coverage()
    crashes = []
    # warm the coverage map (and JIT any lazy imports) on the seeds
    for s in corpus:
        cov.run(fn, s)

    for i in range(execs):
        data = mutate(rs, corpus)
        new, exc = cov.run(fn, data)
        if exc is not None:
            crashes.append((data, exc))
            CRASHES.mkdir(parents=True, exist_ok=True)
            tag = hashlib.sha1(data).hexdigest()[:12]
            (CRASHES / f"{name}-{tag}").write_bytes(data)
            print(f"[{name}] CRASH {type(exc).__name__}: {exc} "
                  f"-> crashes/{name}-{tag}")
        elif new:
            corpus.append(data)
            if save_corpus:
                corpus_dir.mkdir(parents=True, exist_ok=True)
                tag = hashlib.sha1(data).hexdigest()[:12]
                (corpus_dir / tag).write_bytes(data)
    mon = sys.monitoring
    mon.register_callback(_TOOL, mon.events.LINE, None)
    mon.free_tool_id(_TOOL)
    return crashes


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--target", choices=sorted(TARGETS), default=None)
    ap.add_argument("--execs", type=int, default=20000)
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args()
    names = [args.target] if args.target else sorted(TARGETS)
    total_crashes = 0
    for name in names:
        crashes = fuzz_target(name, args.execs, args.seed)
        print(f"[{name}] {args.execs} execs, {len(crashes)} crashes")
        total_crashes += len(crashes)
    sys.exit(1 if total_crashes else 0)


if __name__ == "__main__":
    main()
