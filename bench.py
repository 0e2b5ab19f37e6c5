"""Headline benchmark suite on one TPU chip + the host CPU.

Mirrors the reference benchmark methodology (wall-clock per op,
/root/reference/benchmark/benchmark_test.cpp:526-539) on its API-0 config
(:62-66): P010 BT2100/HLG input, q95, one-pass gain map, plus its decode
configs (:481-494).  Content is PHOTOGRAPHIC, like the reference's own
benchmark corpus (UltrahdrBenchmarkTestRes photographs,
benchmark_test.cpp:55-72): the reference's 1280x720 P010 test fixture
mosaicked to 4K (benchmarks.natural_p010), with the old synthetic-scene
fallback when the fixture is absent.  Compressed size (which bounds this
build's host-link transfer) is content-dependent, so baseline and build
are always measured on the SAME content.

Baseline = the reference library built from /root/reference, measured on
THIS machine on the SAME scene (single core == max threads here; the host
has 1 CPU and the reference caps at min(cores,4), jpegr.cpp:732):

    4K API-0 encode: 3.44 MP/s (2408 ms)    decode->HLG1010102: 9.0 MP/s

(measured 2026-08-17 best-of-N wall clock on /tmp/photo_4k.p010;
BASELINE.md records both content variants.)

Metrics (medians over reps; the tunnel link has +-30% variance):
  headline  api0_encode_4k_p010_hlg — pipelined batch encode, host P010
            input -> JPEG_R bytes on host (the reference's own contract).
  extra.decode_host_4k_hlg — decode_host (native C++ engine), JPEG_R ->
            RGBA1010102 in host memory (the reference's decode contract).
  extra.decode_device_4k_hlg — decode_to_device, output left HBM-resident
            (the TPU-serving contract; no 33 MB output download).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", "extra"}.
"""

import json
import statistics
import time

import numpy as np

REF_ENCODE_4K_MPPS = 3.44    # reference, this host, same fixture-mosaic scene
REF_DECODE_4K_MPPS = 9.0     # reference decode->HLG/RGBA1010102
# grainy = benchmarks.grainy_p010, real-capture residual entropy (the
# fixture mosaic is a flat chart; see BASELINE.md content variants)
REF_ENCODE_GRAINY_MPPS = 3.58
REF_DECODE_GRAINY_MPPS = 8.89
W, H = 3840, 2160
BATCH = 8          # images in flight: overlaps upload/compute/download
ENC_REPS = 5
DEC_REPS = 5
# link normalization anchor: the tunnel swings 12-60 MB/s run to run; the
# secondary encode_link_normalized metric re-prices the measured wire
# bytes at this nominal link speed so cross-round numbers are comparable
LINK_NOMINAL_MBPS = 45.0


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


def _ping(dev_arr):
    """One tiny dependent d2h fetch: the link's fixed round-trip latency."""
    t0 = time.perf_counter()
    np.asarray(dev_arr[:1])
    return time.perf_counter() - t0


def main():
    from libultrahdr_tpu.fused import encode_api0_p010_pipelined
    from libultrahdr_tpu.jpegr import JpegR
    from libultrahdr_tpu.types import (ColorGamut, ColorRange, ColorTransfer,
                                       ImgFmt, RawImage)

    import benchmarks
    base = benchmarks.natural_p010(W, H)
    imgs = []
    for i in range(BATCH):
        # distinct-but-statistically-matched images: slide the mosaic
        # (even column offsets keep interleaved U/V in their lanes)
        yp = np.ascontiguousarray(np.roll(base.planes[0], (8 * i, 32 * i),
                                          axis=(0, 1)))
        uvp = np.ascontiguousarray(np.roll(base.planes[1], (4 * i, 32 * i),
                                           axis=(0, 1)))
        imgs.append(RawImage(ImgFmt.P010, ColorGamut.BT2100, ColorTransfer.HLG,
                             ColorRange.FULL, W, H, [yp, uvp]))

    jr = JpegR(map_dimension_scale_factor=4, use_multi_channel_gainmap=False,
               preset=0)

    # link-speed diagnostic: the tunnel swings ~25-60 MB/s run to run and
    # bounds the upload-limited encode; record it so the headline is
    # interpretable (h2d of an 8 MB incompressible buffer, best of 3)
    import jax
    rs = np.random.RandomState(0)
    probe = rs.randint(0, 2 ** 32, size=2 * 1024 * 1024, dtype=np.uint32)
    h2d = 0.0
    for _ in range(3):
        t0 = time.perf_counter()
        dev = jax.device_put(probe)
        np.asarray(dev[:1])
        h2d = max(h2d, probe.nbytes / (time.perf_counter() - t0) / 1e6)

    # warmup: compile the fused program + fetch-slice buckets
    outs = encode_api0_p010_pipelined(jr, imgs[:2], quality=95)

    # ---- encode headline (pipelined, host input) ----
    # best-of-N wall clock, the same statistic the committed reference
    # baseline used (header above): the tunnel's ±30% link swings make
    # median a weather report, best-of-N a build property.
    enc_times = []
    for _ in range(ENC_REPS):
        t0 = time.perf_counter()
        outs = encode_api0_p010_pipelined(jr, imgs, quality=95)
        enc_times.append((time.perf_counter() - t0) / BATCH)
    assert all(len(o) > 10000 for o in outs)
    enc_best = min(enc_times)
    enc_mpps = W * H / 1e6 / enc_best
    enc_median_mpps = W * H / 1e6 / statistics.median(enc_times)

    data = outs[0]

    # ---- decode to host (native C++ engine) ----
    d = JpegR()
    dec_times = []
    for _ in range(DEC_REPS):
        t0 = time.perf_counter()
        dest, _ = d.decode_host(data, output_ct=ColorTransfer.HLG)
        dec_times.append(time.perf_counter() - t0)
    assert dest.w == W and dest.planes[0].dtype == np.uint32
    dec_host_mpps = W * H / 1e6 / statistics.median(dec_times)

    # ---- decode to device-resident (TPU serving path) ----
    # NB: block_until_ready is a no-op on the axon backend; force completion
    # with a tiny dependent fetch (4 words), not a 33 MB download.
    ddev_times = []
    dev_arr = None
    for i in range(DEC_REPS):
        src = outs[i % len(outs)]
        t0 = time.perf_counter()
        dev_arr, _ = d.decode_to_device(src, output_ct=ColorTransfer.HLG)
        np.asarray(dev_arr[:1, :4])
        ddev_times.append(time.perf_counter() - t0)
    dec_dev_mpps = W * H / 1e6 / statistics.median(ddev_times)

    # ---- batched device-resident decode (one upload/program per K) ----
    res = d.decode_to_device_batch(outs, output_ct=ColorTransfer.HLG)
    np.asarray(res[-1][0][:1, :4])      # warm the K-sized vmapped program
    dbatch_times = []
    for _ in range(max(2, DEC_REPS // 2)):
        t0 = time.perf_counter()
        res = d.decode_to_device_batch(outs, output_ct=ColorTransfer.HLG)
        np.asarray(res[-1][0][:1, :4])
        dbatch_times.append((time.perf_counter() - t0) / len(outs))
    dec_batch_mpps = W * H / 1e6 / statistics.median(dbatch_times)

    # ---- device-compute probe: the full fused API-0 program on a
    # device-RESIDENT wire buffer (one upload up front), synced by a tiny
    # 4-word fetch.  Link-independent up to one fetch latency, which is
    # measured separately (ping) and subtracted.
    from libultrahdr_tpu import fused as fmod
    from libultrahdr_tpu.types import ColorGamut as CG
    im0 = imgs[0]
    wire, mode = fmod._pack_wire_auto(im0.planes[0], im0.planes[1])
    dc_times = []
    if wire is not None:
        import jax.numpy as jnp
        buf_dev = jax.device_put(jnp.asarray(wire))
        np.asarray(buf_dev[:1])
        ping = min(_ping(buf_dev) for _ in range(5))
        common = dict(h=H, w=W, cg=CG.BT2100, ct=ColorTransfer.HLG,
                      rng=ColorRange.FULL, scale=4, multichannel=False,
                      gamma=1.0, quality=95, map_quality=jr.map_compress_quality,
                      use_base_cg=False, wire_2d=mode[0], wire_bits=mode[1],
                      wire_cap=mode[2])
        words, _bl = fmod._fused_api0_p010_delta7(buf_dev, **common)
        np.asarray(words[:4])
        for _ in range(5):
            t0 = time.perf_counter()
            words, _bl = fmod._fused_api0_p010_delta7(buf_dev, **common)
            np.asarray(words[:4])
            dc_times.append(time.perf_counter() - t0 - ping)
    dev_ms = statistics.median(dc_times) * 1e3 if dc_times else None

    # ---- link-normalized secondary: re-price the measured upload bytes
    # at the nominal link speed so the encode number is comparable across
    # link weather (the committed artifact otherwise tracks the tunnel's
    # 12-60 MB/s swings, not the build)
    enc_norm_mpps = None
    if wire is not None and h2d > 1.0:
        # the probe can be stale vs the moment the encode actually ran
        # (it is measured minutes earlier); the encode itself lower-bounds
        # the link at wire_bytes/enc_best, so use whichever is larger —
        # at that bound the estimate assumes a fully upload-bound pipeline
        eff = max(h2d, wire.nbytes / enc_best / 1e6)
        t_norm = enc_best - wire.nbytes / (eff * 1e6) \
            + wire.nbytes / (LINK_NOMINAL_MBPS * 1e6)
        if t_norm > 0:
            enc_norm_mpps = W * H / 1e6 / t_norm

    # ---- grainy (high-entropy) content variant: keeps entropy-sensitive
    # numbers honest (the headline scene is the reference's own flat-chart
    # fixture; BASELINE.md).  Never breaks the headline.
    grainy_enc = grainy_dec = None
    try:
        from benchmarks import grainy_p010
        gimgs = [grainy_p010(W, H, seed=23 + i) for i in range(2)]
        gouts = encode_api0_p010_pipelined(jr, gimgs, quality=95)  # warm
        gt = []
        for _ in range(2):
            t0 = time.perf_counter()
            gouts = encode_api0_p010_pipelined(jr, gimgs, quality=95)
            gt.append((time.perf_counter() - t0) / len(gimgs))
        grainy_enc = W * H / 1e6 / statistics.median(gt)
        d.decode_host(gouts[0], output_ct=ColorTransfer.HLG)
        gt = []
        for _ in range(3):
            t0 = time.perf_counter()
            d.decode_host(gouts[0], output_ct=ColorTransfer.HLG)
            gt.append(time.perf_counter() - t0)
        grainy_dec = W * H / 1e6 / statistics.median(gt)
    except Exception:
        pass

    print(json.dumps({
        "metric": "api0_encode_4k_p010_hlg",
        "value": round(enc_mpps, 3),
        "unit": "MP/s",
        "vs_baseline": round(enc_mpps / REF_ENCODE_4K_MPPS, 3),
        "extra": {
            "decode_host_4k_hlg_mpps": round(dec_host_mpps, 3),
            "decode_host_vs_baseline": round(
                dec_host_mpps / REF_DECODE_4K_MPPS, 3),
            "decode_device_4k_hlg_mpps": round(dec_dev_mpps, 3),
            "decode_device_vs_baseline": round(
                dec_dev_mpps / REF_DECODE_4K_MPPS, 3),
            "decode_device_batch8_4k_hlg_mpps": round(dec_batch_mpps, 3),
            "encode_device_compute_4k_ms": (round(dev_ms, 1)
                                            if dev_ms else None),
            "encode_device_compute_4k_mpps": (round(W * H / 1e6
                                                    / (dev_ms / 1e3), 2)
                                              if dev_ms else None),
            "encode_grainy_4k_mpps": (round(grainy_enc, 3)
                                      if grainy_enc else None),
            "encode_grainy_vs_baseline": (round(
                grainy_enc / REF_ENCODE_GRAINY_MPPS, 3)
                if grainy_enc else None),
            "decode_host_grainy_4k_mpps": (round(grainy_dec, 3)
                                           if grainy_dec else None),
            "decode_host_grainy_vs_baseline": (round(
                grainy_dec / REF_DECODE_GRAINY_MPPS, 3)
                if grainy_dec else None),
            "encode_median_4k_mpps": round(enc_median_mpps, 3),
            "encode_link_normalized_mpps": (round(enc_norm_mpps, 3)
                                            if enc_norm_mpps else None),
            "encode_wire_bytes_per_img": (int(wire.nbytes)
                                          if wire is not None else None),
            "link_nominal_mbps": LINK_NOMINAL_MBPS,
            "encode_reps": ENC_REPS, "decode_reps": DEC_REPS,
            "stat": "best-of-reps (headline), median (extras)",
            "link_h2d_mbps": round(h2d, 1),
        },
    }))


def _tpu_available(timeout_s: int = 280) -> bool:
    """Probe device-backend health in a subprocess (the axon tunnel has
    shown multi-hour outages where jax init hangs ~25 min then raises
    UNAVAILABLE; a hung probe must not eat the whole bench budget)."""
    import subprocess
    import sys
    try:
        r = subprocess.run(
            [sys.executable, "-c", "import jax; jax.devices()"],
            timeout=timeout_s, capture_output=True)
        return r.returncode == 0
    except subprocess.TimeoutExpired:
        return False


def _fallback_cpu_only():
    """Device backend unavailable: record the outage plus the CPU-side
    engine numbers (decode_host needs no device), one honest JSON line."""
    import jax
    jax.config.update("jax_platforms", "cpu")
    extra = {"error": "device backend unavailable; CPU-side metrics only"}
    try:
        import subprocess
        from libultrahdr_tpu.jpegr import JpegR
        from libultrahdr_tpu.types import ColorTransfer
        from benchmarks import grainy_p010, natural_p010
        app = "/tmp/refbuild/ultrahdr_app"
        d = JpegR()
        for key, maker, ref in (
                ("decode_host_4k_hlg_mpps", natural_p010,
                 REF_DECODE_4K_MPPS),
                ("decode_host_grainy_4k_mpps", grainy_p010,
                 REF_DECODE_GRAINY_MPPS)):
            img = maker(W, H)
            raw = "/tmp/bench_fb.p010"
            np.concatenate([img.planes[0].ravel(),
                            img.planes[1].ravel()]).tofile(raw)
            r = subprocess.run(
                [app, "-m", "0", "-p", raw, "-w", str(W), "-h", str(H),
                 "-a", "0", "-C", "2", "-t", "1", "-q", "95",
                 "-z", "/tmp/bench_fb.jpg"], capture_output=True)
            if r.returncode != 0:
                break
            data = open("/tmp/bench_fb.jpg", "rb").read()
            d.decode_host(data, output_ct=ColorTransfer.HLG)
            ts = []
            for _ in range(5):
                t0 = time.perf_counter()
                d.decode_host(data, output_ct=ColorTransfer.HLG)
                ts.append(time.perf_counter() - t0)
            extra[key] = round(W * H / 1e6 / statistics.median(ts), 3)
            extra[key.replace("_mpps", "_vs_baseline")] = round(
                extra[key] / ref, 3)
    except Exception as e:  # keep the line printable no matter what
        extra["fallback_error"] = repr(e)[:200]
    print(json.dumps({"metric": "api0_encode_4k_p010_hlg", "value": 0,
                      "unit": "MP/s", "vs_baseline": 0, "extra": extra}))


if __name__ == "__main__":
    import os
    if os.environ.get("UHDR_BENCH_SKIP_PROBE") == "1" or _tpu_available():
        main()
    else:
        _fallback_cpu_only()
