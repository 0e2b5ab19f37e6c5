"""Benchmark harness mirroring the reference's google-benchmark matrix
(/root/reference/benchmark/benchmark_test.cpp):

- decode set (:55-60,481-494): JPEG_R -> {HLG/1010102, PQ/1010102,
  LINEAR/F16, SRGB/8888} on single- and multi-channel gain maps
- encode API-0 set (:62-66,495-502): 12 MP p010, BT2100, {single,multi}
  channel x gamma {1.0, 1.571}
- encode API-1 set (:68-72,503-524): + yuv420 SDR, realtime & best presets

Reports wall-ms per op (best of N) and MP/s, like the reference's
Unit(kMillisecond) counters.  Run: python benchmarks.py [--quick]
"""

from __future__ import annotations

import argparse
import sys
import time

import numpy as np

from bench import make_scene
from libultrahdr_tpu.jpegr import JpegR
from libultrahdr_tpu.types import (ColorGamut, ColorRange, ColorTransfer,
                                   EncPreset, ImgFmt, RawImage)


def _best(f, reps):
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        f()
        best = min(best, time.perf_counter() - t0)
    return best


def _p010(w, h):
    yp, uvp = make_scene(w, h)
    return RawImage(ImgFmt.P010, ColorGamut.BT2100, ColorTransfer.HLG,
                    ColorRange.FULL, w, h, [yp, uvp])


def _yuv420_from(img):
    jr = JpegR()
    return jr.tone_map(img)


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--quick", action="store_true",
                    help="720p, 1 reps (smoke test)")
    ap.add_argument("--reps", type=int, default=3)
    args = ap.parse_args(argv)

    if args.quick:
        w, h, reps = 1280, 720, 1
    else:
        w, h, reps = 4080, 3072, args.reps  # reference's 12 MP config
    mp = w * h / 1e6
    hdr = _p010(w, h)
    rows = []

    # ---- encode API-0 matrix ------------------------------------------
    for multi in (False, True):
        for gamma in (1.0, 1.571):
            jr = JpegR(map_dimension_scale_factor=4,
                       use_multi_channel_gainmap=multi, gamma=gamma,
                       preset=EncPreset.REALTIME)
            jr.encode_api0(hdr, quality=95)  # warm
            dt = _best(lambda: jr.encode_api0(hdr, quality=95), reps)
            rows.append((f"enc api0 p010 {'multi' if multi else 'single'} "
                         f"g={gamma}", dt, mp / dt))

    # ---- encode API-1 matrix ------------------------------------------
    sdr = _yuv420_from(hdr)
    for preset in (EncPreset.REALTIME, EncPreset.BEST_QUALITY):
        jr = JpegR(map_dimension_scale_factor=4, preset=preset)
        jr.encode_api1(hdr, sdr, quality=95)
        dt = _best(lambda: jr.encode_api1(hdr, sdr, quality=95), reps)
        rows.append((f"enc api1 p010+yuv420 {preset.name.lower()}", dt,
                     mp / dt))

    # ---- decode matrix -------------------------------------------------
    for multi in (False, True):
        jr = JpegR(map_dimension_scale_factor=4,
                   use_multi_channel_gainmap=multi)
        data = jr.encode_api0(hdr, quality=95)
        tag = "multi" if multi else "single"
        for ct, fmt in [(ColorTransfer.HLG, ImgFmt.RGBA1010102),
                        (ColorTransfer.PQ, ImgFmt.RGBA1010102),
                        (ColorTransfer.LINEAR, ImgFmt.RGBAF16),
                        (ColorTransfer.SRGB, ImgFmt.RGBA8888)]:
            d = JpegR()
            d.decode(data, output_ct=ct, output_fmt=fmt)  # warm
            dt = _best(lambda: d.decode(data, output_ct=ct,
                                        output_fmt=fmt), reps)
            rows.append((f"dec {tag} -> {ct.name.lower()}", dt, mp / dt))

    width = max(len(r[0]) for r in rows)
    print(f"{'config':<{width}}  {'ms':>9}  {'MP/s':>8}")
    for name, dt, mpps in rows:
        print(f"{name:<{width}}  {dt * 1e3:9.1f}  {mpps:8.2f}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
