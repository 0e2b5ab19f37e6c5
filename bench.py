"""Headline benchmark suite on one TPU chip + the host CPU.

Mirrors the reference benchmark methodology (wall-clock per op,
/root/reference/benchmark/benchmark_test.cpp:526-539) on its API-0 config
(:62-66): P010 BT2100/HLG input, q95, one-pass gain map, plus its decode
configs (:481-494).

HEADLINE CONTENT IS PHOTOGRAPHIC (scene "photo", benchmarks.photo_p010):
tiles of a real camera capture with exposure modulation and an HDR
highlight field — the reference's own benchmark corpus is photographs
(UltrahdrBenchmarkTestRes, benchmark_test.cpp:55-72), and photographic
entropy is what prices the wire/entropy-sensitive stages honestly.  The
flat-chart fixture mosaic (scene "mosaic", the old headline) and the
synthetic high-entropy scene ("grainy") are reported alongside.  Baseline
and build are ALWAYS compared on the SAME content; every number carries
its scene.

Baseline = the reference library built from /root/reference, measured on
THIS machine per scene (single core == max threads here; the host has 1
CPU and the reference caps at min(cores,4), jpegr.cpp:732), best-of-N:

    photo  4K API-0 encode 2.392 MP/s   decode->HLG1010102 6.307 MP/s
    grainy 4K API-0 encode 3.58  MP/s   decode->HLG1010102 8.89  MP/s
    mosaic 4K API-0 encode 3.44  MP/s   decode->HLG1010102 9.0   MP/s

(BASELINE.md records the measurement history and content definitions.)

Metrics (best-of-reps headline, medians for extras; the tunnel link has
+-30% variance):
  headline  api0_encode_4k_p010_hlg (scene=photo) — pipelined batch
            encode, host P010 input -> JPEG_R bytes on host (the
            reference's own contract).
  extra.decode_host_4k_hlg — decode_host (native C++ engine), JPEG_R ->
            RGBA1010102 in host memory (the reference's decode contract),
            photo scene.
  extra.decode_serving_4k_hlg — decode_to_device under 8 concurrent
            clients (the TPU-serving contract: HBM-resident output, the
            default microbatcher coalescing requests).
  extra.*_mosaic / *_grainy — same ops on the other scenes.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", "extra"}.
"""

import json
import statistics
import time

import numpy as np

# per-scene reference anchors, measured on this host (BASELINE.md)
REF = {
    "photo": {"encode": 2.392, "decode": 6.307},
    "grainy": {"encode": 3.58, "decode": 8.89},
    "mosaic": {"encode": 3.44, "decode": 9.0},
}
W, H = 3840, 2160
BATCH = 8          # images in flight: overlaps upload/compute/download
ENC_REPS = 5
DEC_REPS = 5
# link normalization anchor: the tunnel swings 12-60 MB/s run to run; the
# secondary encode_link_normalized metric re-prices the measured wire
# bytes at this nominal link speed so cross-round numbers are comparable
LINK_NOMINAL_MBPS = 45.0


def make_scene(w, h, seed=11, phase=0.0):
    """Synthetic natural HDR scene in P010 planes (benchmarks.py's
    fallback content when the committed fixtures are absent)."""
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


def _scene_imgs(maker, k=BATCH):
    """k distinct-but-statistically-matched images: slide the scene
    (even column offsets keep interleaved U/V in their lanes)."""
    from libultrahdr_tpu.types import (ColorGamut, ColorRange,
                                       ColorTransfer, ImgFmt, RawImage)
    base = maker(W, H)
    imgs = []
    for i in range(k):
        yp = np.ascontiguousarray(np.roll(base.planes[0], (8 * i, 32 * i),
                                          axis=(0, 1)))
        uvp = np.ascontiguousarray(np.roll(base.planes[1], (4 * i, 32 * i),
                                           axis=(0, 1)))
        imgs.append(RawImage(ImgFmt.P010, ColorGamut.BT2100,
                             ColorTransfer.HLG, ColorRange.FULL, W, H,
                             [yp, uvp]))
    return imgs


def _ping(dev_arr):
    """One tiny dependent d2h fetch: the link's fixed round-trip latency."""
    t0 = time.perf_counter()
    np.asarray(dev_arr[:1])
    return time.perf_counter() - t0


def _bench_encode(jr, imgs, reps=ENC_REPS):
    from libultrahdr_tpu.fused import encode_api0_p010_pipelined
    outs = encode_api0_p010_pipelined(jr, imgs[:4], quality=95)  # warm
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        outs = encode_api0_p010_pipelined(jr, imgs, quality=95)
        ts.append((time.perf_counter() - t0) / len(imgs))
    assert all(len(o) > 10000 for o in outs)
    mp = W * H / 1e6
    return mp / min(ts), mp / statistics.median(ts), outs


def _bench_decode_host(d, data, reps=DEC_REPS):
    from libultrahdr_tpu.types import ColorTransfer
    d.decode_host(data, output_ct=ColorTransfer.HLG)  # warm
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        dest, _ = d.decode_host(data, output_ct=ColorTransfer.HLG)
        ts.append(time.perf_counter() - t0)
    assert dest.w == W and dest.planes[0].dtype == np.uint32
    return W * H / 1e6 / statistics.median(ts)


def _bench_decode_serving(d, streams, clients=8, rounds=3):
    """The TPU-serving contract: N concurrent decode_to_device callers,
    outputs HBM-resident, requests coalescing through the default
    microbatcher.  Throughput = total MP decoded / wall time."""
    import concurrent.futures as cf
    from libultrahdr_tpu.types import ColorTransfer

    def one(data):
        arr, _ = d.decode_to_device(data, output_ct=ColorTransfer.HLG)
        np.asarray(arr[:1, :4])     # force completion (tiny fetch)
        return arr

    with cf.ThreadPoolExecutor(clients) as ex:
        list(ex.map(one, streams[:clients]))      # warm
        ts = []
        for _ in range(rounds):
            t0 = time.perf_counter()
            list(ex.map(one, streams[:clients]))
            ts.append((time.perf_counter() - t0) / clients)
    return W * H / 1e6 / statistics.median(ts)


def _bench_decode_device_single(d, streams, reps=DEC_REPS):
    """Per-image device-resident path (microbatcher off): the latency
    contract, one request at a time."""
    from libultrahdr_tpu.types import ColorTransfer
    ts = []
    for i in range(reps + 1):
        src = streams[i % len(streams)]
        t0 = time.perf_counter()
        arr, _ = d.decode_to_device(src, output_ct=ColorTransfer.HLG,
                                    microbatch=False)
        np.asarray(arr[:1, :4])
        if i:
            ts.append(time.perf_counter() - t0)
    return W * H / 1e6 / statistics.median(ts)


def main():
    import jax

    import benchmarks
    from libultrahdr_tpu import fused as fmod
    from libultrahdr_tpu.jpegr import JpegR
    from libultrahdr_tpu.types import ColorGamut, ColorRange, ColorTransfer

    jr = JpegR(map_dimension_scale_factor=4, use_multi_channel_gainmap=False,
               preset=0)
    d = JpegR()

    # link-speed diagnostic: the tunnel swings ~12-60 MB/s run to run and
    # bounds the upload-limited encode; record it so the headline is
    # interpretable (h2d of an 8 MB incompressible buffer, best of 3)
    rs = np.random.RandomState(0)
    probe = rs.randint(0, 2 ** 32, size=2 * 1024 * 1024, dtype=np.uint32)
    h2d = 0.0
    for _ in range(3):
        t0 = time.perf_counter()
        dev = jax.device_put(probe)
        np.asarray(dev[:1])
        h2d = max(h2d, probe.nbytes / (time.perf_counter() - t0) / 1e6)

    extra = {"scene": "photo", "link_h2d_mbps": round(h2d, 1),
             "encode_reps": ENC_REPS, "decode_reps": DEC_REPS,
             "stat": "best-of-reps (headline), median (extras)",
             "link_nominal_mbps": LINK_NOMINAL_MBPS}

    # ---------------- photo scene (HEADLINE) ----------------
    imgs = _scene_imgs(benchmarks.photo_p010)
    enc_best, enc_med, outs = _bench_encode(jr, imgs)
    extra["encode_median_4k_mpps"] = round(enc_med, 3)
    extra["decode_host_4k_hlg_mpps"] = round(
        _bench_decode_host(d, outs[0]), 3)
    extra["decode_host_vs_baseline"] = round(
        extra["decode_host_4k_hlg_mpps"] / REF["photo"]["decode"], 3)
    extra["decode_serving_4k_hlg_mpps"] = round(
        _bench_decode_serving(d, outs), 3)
    extra["decode_serving_vs_baseline"] = round(
        extra["decode_serving_4k_hlg_mpps"] / REF["photo"]["decode"], 3)
    extra["decode_device_single_4k_hlg_mpps"] = round(
        _bench_decode_device_single(d, outs), 3)

    # wire bytes + device-compute probe on the photo wire (ping-subtracted;
    # block_until_ready is a no-op on the axon backend)
    im0 = imgs[0]
    wire, mode = fmod._pack_wire_auto(im0.planes[0], im0.planes[1])
    dev_ms = None
    if wire is not None:
        import jax.numpy as jnp
        buf_dev = jax.device_put(jnp.asarray(wire))
        np.asarray(buf_dev[:1])
        ping = min(_ping(buf_dev) for _ in range(5))
        common = dict(h=H, w=W, cg=ColorGamut.BT2100, ct=ColorTransfer.HLG,
                      rng=ColorRange.FULL, scale=4, multichannel=False,
                      gamma=1.0, quality=95,
                      map_quality=jr.map_compress_quality,
                      use_base_cg=False)
        if mode[0] == "vw":
            run = lambda: fmod._fused_api0_p010_vw(buf_dev, **common)  # noqa: E731
        else:
            run = lambda: fmod._fused_api0_p010_delta7(  # noqa: E731
                buf_dev, wire_2d=mode[0], wire_bits=mode[1],
                wire_cap=mode[2], **common)
        words, _bl = run()
        np.asarray(words[:4])
        dc = []
        for _ in range(5):
            t0 = time.perf_counter()
            words, _bl = run()
            np.asarray(words[:4])
            dc.append(time.perf_counter() - t0 - ping)
        dev_ms = statistics.median(dc) * 1e3
        extra["encode_wire_bytes_per_img"] = int(wire.nbytes)
        extra["encode_wire_mode"] = str(mode)
        extra["encode_device_compute_4k_ms"] = round(dev_ms, 1)
        extra["encode_device_compute_4k_mpps"] = round(
            W * H / 1e6 / (dev_ms / 1e3), 2)

    # link-normalized secondary: re-price the measured upload bytes at the
    # nominal link speed so the encode number is comparable across link
    # weather
    if wire is not None and h2d > 1.0:
        enc_best_t = W * H / 1e6 / enc_best
        eff = max(h2d, wire.nbytes / enc_best_t / 1e6)
        t_norm = enc_best_t - wire.nbytes / (eff * 1e6) \
            + wire.nbytes / (LINK_NOMINAL_MBPS * 1e6)
        if t_norm > 0:
            extra["encode_link_normalized_mpps"] = round(
                W * H / 1e6 / t_norm, 3)

    # ---------------- other scenes ----------------
    for scene, maker in (("grainy", benchmarks.grainy_p010),
                         ("mosaic", benchmarks.natural_p010)):
        try:
            simgs = _scene_imgs(maker, 4)
            e_best, _, souts = _bench_encode(jr, simgs, reps=3)
            extra[f"encode_{scene}_4k_mpps"] = round(e_best, 3)
            extra[f"encode_{scene}_vs_baseline"] = round(
                e_best / REF[scene]["encode"], 3)
            dh = _bench_decode_host(d, souts[0], reps=3)
            extra[f"decode_host_{scene}_4k_mpps"] = round(dh, 3)
            extra[f"decode_host_{scene}_vs_baseline"] = round(
                dh / REF[scene]["decode"], 3)
        except Exception:   # never break the headline
            pass

    print(json.dumps({
        "metric": "api0_encode_4k_p010_hlg",
        "value": round(enc_best, 3),
        "unit": "MP/s",
        "vs_baseline": round(enc_best / REF["photo"]["encode"], 3),
        "extra": extra,
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
    extra = {"error": "device backend unavailable; CPU-side metrics only",
             "scene": "photo"}
    try:
        import subprocess

        import benchmarks
        from libultrahdr_tpu.jpegr import JpegR
        from libultrahdr_tpu.types import ColorTransfer
        app = "/tmp/refbuild/ultrahdr_app"
        d = JpegR()
        for scene, maker in (("photo", benchmarks.photo_p010),
                             ("grainy", benchmarks.grainy_p010)):
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
            key = "decode_host_4k_hlg_mpps" if scene == "photo" \
                else f"decode_host_{scene}_4k_mpps"
            extra[key] = round(W * H / 1e6 / statistics.median(ts), 3)
            extra[key.replace("_mpps", "_vs_baseline")] = round(
                extra[key] / REF[scene]["decode"], 3)
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
