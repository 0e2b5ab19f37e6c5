"""Headline benchmark: API-0 4K encode throughput (MP/s) on one TPU chip.

Mirrors the reference benchmark methodology (wall-clock per op,
/root/reference/benchmark/benchmark_test.cpp:526-539) on its API-0 config
(:62-66): P010 BT2100/HLG input, q95, one-pass gain map.  Content is a
synthetic natural scene (smooth gradients + soft shapes + mild texture) —
the reference's own benchmark uses photographs, and compressed size (which
bounds the TPU build's host-link transfer) is content-dependent.

Baseline = the reference library built from /root/reference, measured on
THIS machine on the SAME scene (single core == max threads here; the host
has 1 CPU and the reference caps at min(cores,4), jpegr.cpp:732):

    4K API-0 encode: 2.787 MP/s (2976 ms)    decode->HLG: 8.210 MP/s

(measured 2026-08-16, /tmp/refbench + /tmp/scene_4k.p010; BASELINE.md.)

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

import json
import time

import numpy as np

REF_ENCODE_4K_MPPS = 2.787  # reference, this host, same scene
W, H = 3840, 2160
BATCH = 8          # images in flight: overlaps upload/compute/download
REPS = 3


def make_scene(w, h, seed=11, phase=0.0):
    """Synthetic natural 4K HDR scene in P010."""
    yy, xx = np.mgrid[0:h, 0:w].astype(np.float32)
    base = 0.45 + 0.3 * np.sin(xx / 700.0 + 1.3 + phase) * np.cos(yy / 500.0)
    blobs = (0.35 * np.exp(-(((xx - 2600) / 520.0) ** 2
                             + ((yy - 700) / 380.0) ** 2))
             + 0.5 * np.exp(-(((xx - 900) / 300.0) ** 2
                              + ((yy - 1500) / 260.0) ** 2)))
    rs = np.random.RandomState(seed)
    tex = rs.randn(h // 8, w // 8).astype(np.float32)
    tex = np.kron(tex, np.ones((8, 8), np.float32)) * 0.015
    lum = np.clip(base + blobs + tex, 0.0, 1.0)
    yp = (np.clip(lum * 1023.0, 0, 1023).astype(np.uint16) << 6)
    u = 0.5 + 0.18 * np.sin(xx[::2, :] / 900.0) * np.cos(yy[::2, :] / 650.0)
    uvp = np.empty((h // 2, w), np.uint16)
    uvp[:, 0::2] = (np.clip(u[:, 0::2] * 1023.0, 0, 1023)
                    .astype(np.uint16) << 6)
    uvp[:, 1::2] = (np.clip((1.0 - u)[:, 1::2] * 1023.0, 0, 1023)
                    .astype(np.uint16) << 6)
    return yp, uvp


def main():
    from libultrahdr_tpu.fused import encode_api0_p010_pipelined
    from libultrahdr_tpu.jpegr import JpegR
    from libultrahdr_tpu.types import (ColorGamut, ColorRange, ColorTransfer,
                                       ImgFmt, RawImage)

    imgs = []
    for i in range(BATCH):
        yp, uvp = make_scene(W, H, seed=11 + i, phase=0.37 * i)
        imgs.append(RawImage(ImgFmt.P010, ColorGamut.BT2100, ColorTransfer.HLG,
                             ColorRange.FULL, W, H, [yp, uvp]))

    jr = JpegR(map_dimension_scale_factor=4, use_multi_channel_gainmap=False,
               preset=0)

    # warmup: compile the fused program + fetch-slice buckets
    encode_api0_p010_pipelined(jr, imgs[:2], quality=95)

    best = float("inf")
    for _ in range(REPS):
        t0 = time.perf_counter()
        outs = encode_api0_p010_pipelined(jr, imgs, quality=95)
        dt = time.perf_counter() - t0
        best = min(best, dt / BATCH)
    assert all(len(o) > 10000 for o in outs)

    mpps = W * H / 1e6 / best
    print(json.dumps({
        "metric": "api0_encode_4k_p010_hlg",
        "value": round(mpps, 3),
        "unit": "MP/s",
        "vs_baseline": round(mpps / REF_ENCODE_4K_MPPS, 3),
    }))


if __name__ == "__main__":
    main()
