#!/usr/bin/env python3
"""Phase-level profile of the pipelined API-0 encode on real TPU.

Answers "where does the non-link time go" for VERDICT r04 item 1: the
photo-scene pipelined encode measures well below the wire-bytes x link
upper bound.  Phases timed per frame:

  pack      host native vw pack (pack_vw_wire)
  upload    jnp.asarray(stacked wire) until the device buffer is ready
  compute   k fused program dispatches + stitch, blocked to completion
  drain     blens fetch + scans fetch + container assembly

plus the end-to-end pipelined call itself (the overlap win vs the sum).

Usage: python tools/profile_encode_pipeline.py [--scene photo] [--frames 8]
"""

import argparse
import time

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--scene", default="photo",
                    choices=["photo", "grainy", "mosaic"])
    ap.add_argument("--frames", type=int, default=8)
    ap.add_argument("--reps", type=int, default=3)
    args = ap.parse_args()

    import jax

    import benchmarks
    from libultrahdr_tpu import fused
    from libultrahdr_tpu.jpegr import JpegR
    from libultrahdr_tpu.types import ColorGamut, ColorRange, ColorTransfer

    w, h = 3840, 2160
    maker = {"photo": benchmarks.photo_p010, "grainy": benchmarks.grainy_p010,
             "mosaic": benchmarks.natural_p010}[args.scene]
    imgs = []
    for i in range(args.frames):
        try:
            imgs.append(maker(w, h, seed=17 + i))
        except TypeError:            # natural_p010 takes no seed
            imgs.append(maker(w, h))
    jr = JpegR()
    mp = w * h / 1e6

    # --- phase timings on one frame ------------------------------------
    img = imgs[0]
    t0 = time.perf_counter()
    buf, mode = fused._pack_wire_auto(img.planes[0], img.planes[1])
    t_pack = time.perf_counter() - t0
    print(f"pack:      {t_pack*1e3:8.1f} ms   wire={buf.nbytes/1e6:.2f} MB "
          f"mode={mode}")

    for rep in range(args.reps):
        t0 = time.perf_counter()
        dev = jax.device_put(buf)
        dev.block_until_ready()
        t_up = time.perf_counter() - t0
        print(f"upload:    {t_up*1e3:8.1f} ms   "
              f"({buf.nbytes/1e6/t_up:.1f} MB/s)")

    # compute (program alone, input already on device)
    handle = fused._dispatch_api0_p010(jr, img, 95, wire=(buf, mode))
    words, blens = handle[0], handle[1]
    words.block_until_ready()        # warm compile
    for rep in range(args.reps):
        t0 = time.perf_counter()
        out = fused._fused_api0_p010_vw(
            dev, h=h, w=w, cg=ColorGamut.BT2100, ct=ColorTransfer.HLG,
            rng=ColorRange.FULL, scale=jr.map_dimension_scale_factor or 1,
            multichannel=jr.use_multi_channel_gainmap, gamma=jr.gamma,
            quality=95, map_quality=jr.map_compress_quality,
            use_base_cg=False) if mode[0] == "vw" else None
        if out is not None:
            jax.block_until_ready(out)
        t_comp = time.perf_counter() - t0
        print(f"compute:   {t_comp*1e3:8.1f} ms   (program, vw unpack incl.)")

    t0 = time.perf_counter()
    blen_np = np.asarray(blens)
    t_off = time.perf_counter() - t0
    t0 = time.perf_counter()
    out_bytes = fused._assemble_api0_p010(jr, img, 95, None, words, blens,
                                          handle[2], handle[3],
                                          blen_all=blen_np)
    t_drain = time.perf_counter() - t0
    print(f"offsets:   {t_off*1e3:8.1f} ms")
    print(f"drain:     {t_drain*1e3:8.1f} ms   jpeg_r={len(out_bytes)/1e6:.2f} MB")

    # --- end-to-end pipelined ------------------------------------------
    outs = fused.encode_api0_p010_pipelined(jr, imgs, 95, None)   # warm
    for rep in range(args.reps):
        t0 = time.perf_counter()
        outs = fused.encode_api0_p010_pipelined(jr, imgs, 95, None)
        dt = time.perf_counter() - t0
        print(f"pipelined: {dt*1e3:8.1f} ms / {args.frames} frames = "
              f"{mp*args.frames/dt:6.2f} MP/s")
    assert all(o for o in outs)


if __name__ == "__main__":
    main()
