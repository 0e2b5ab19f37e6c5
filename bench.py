"""Headline benchmark: API-0 4K encode throughput (MP/s) on one TPU chip.

Mirrors the reference benchmark methodology (wall-clock per op,
/root/reference/benchmark/benchmark_test.cpp:526-539) on its API-0 configs
(:62-66).  Baseline = the reference library built from /root/reference and
measured on THIS machine (single core — the host has 1 CPU; the reference
caps at min(cores,4) threads anyway, jpegr.cpp:732):

    refbench 3840x2160 API-0 encode p010/hlg q95 : 2.846 MP/s  (2914 ms)
    refbench 3840x2160 decode -> hlg 1010102     : 6.746 MP/s  (1230 ms)

(measured 2026-08-16 with /tmp/refbuild, see BASELINE.md "To measure" table.)

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

import json
import time

import numpy as np

REF_ENCODE_4K_MPPS = 2.846  # reference, this host, single core
W, H = 3840, 2160
BATCH = 4          # images in flight: overlaps h2d / compute / d2h
REPS = 3


def main():
    from libultrahdr_tpu.jpegr import JpegR
    from libultrahdr_tpu.types import (ColorGamut, ColorRange, ColorTransfer,
                                       ImgFmt, RawImage)

    rs = np.random.RandomState(7)
    imgs = []
    for _ in range(BATCH):
        y = (rs.randint(0, 1024, (H, W)).astype(np.uint16) << 6)
        uv = (rs.randint(0, 1024, (H // 2, W)).astype(np.uint16) << 6)
        imgs.append(RawImage(ImgFmt.P010, ColorGamut.BT2100, ColorTransfer.HLG,
                             ColorRange.FULL, W, H, [y, uv]))

    jr = JpegR(map_dimension_scale_factor=4, use_multi_channel_gainmap=False,
               preset=0)  # REALTIME preset, the API-0 default (jpegr.cpp:200)

    jr.encode_api0(imgs[0], quality=95)  # warmup/compile

    best = float("inf")
    for _ in range(REPS):
        t0 = time.perf_counter()
        for img in imgs:
            out = jr.encode_api0(img, quality=95)
        dt = time.perf_counter() - t0
        best = min(best, dt / BATCH)
    assert len(out) > 10000

    mpps = W * H / 1e6 / best
    print(json.dumps({
        "metric": "api0_encode_4k_p010_hlg",
        "value": round(mpps, 3),
        "unit": "MP/s",
        "vs_baseline": round(mpps / REF_ENCODE_4K_MPPS, 3),
    }))


if __name__ == "__main__":
    main()
