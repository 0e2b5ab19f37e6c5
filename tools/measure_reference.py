"""Measure the reference binary's encode/decode throughput on this host.

Reproduces the BASELINE.md numbers (best-of-N wall clock, single process —
this host has 1 core, so single-core == max-thread for the reference's
min(cores,4) pools, /root/reference/lib/src/jpegr.cpp:732).

Usage:
    python tools/measure_reference.py [--scene grainy|mosaic] [--wh 3840x2160]

Requires the reference demo app built at /tmp/refbuild (see
.claude/skills/verify/SKILL.md for the cmake line).
"""

import argparse
import pathlib
import subprocess
import sys
import time

import numpy as np

REPO = pathlib.Path(__file__).resolve().parent.parent
APP = pathlib.Path("/tmp/refbuild/ultrahdr_app")


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--scene", default="grainy",
                    choices=["grainy", "mosaic", "photo"])
    ap.add_argument("--wh", default="3840x2160")
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--quality", type=int, default=95)
    args = ap.parse_args(argv)
    if not APP.exists():
        sys.exit("reference app missing: build /root/reference at /tmp/refbuild")
    w, h = (int(x) for x in args.wh.split("x"))

    sys.path.insert(0, str(REPO))
    from benchmarks import grainy_p010, natural_p010, photo_p010
    img = {"grainy": grainy_p010, "mosaic": natural_p010,
           "photo": photo_p010}[args.scene](w, h)
    raw = pathlib.Path(f"/tmp/ref_{args.scene}_{w}x{h}.p010")
    np.concatenate([img.planes[0].ravel(),
                    img.planes[1].ravel()]).tofile(raw)
    jpg = raw.with_suffix(".jpg")

    enc = []
    for _ in range(args.reps):
        t0 = time.perf_counter()
        r = subprocess.run([str(APP), "-m", "0", "-p", str(raw),
                            "-w", str(w), "-h", str(h), "-a", "0",
                            "-C", "2", "-t", "1",
                            "-q", str(args.quality), "-z", str(jpg)],
                           capture_output=True)
        enc.append(time.perf_counter() - t0)
        assert r.returncode == 0, r.stderr
    dec = []
    for _ in range(args.reps):
        t0 = time.perf_counter()
        r = subprocess.run([str(APP), "-m", "1", "-j", str(jpg),
                            "-o", "1", "-O", "5",
                            "-z", str(raw.with_suffix(".out"))],
                           capture_output=True)
        dec.append(time.perf_counter() - t0)
        assert r.returncode == 0, r.stderr

    mp = w * h / 1e6
    print(f"scene={args.scene} {w}x{h} q{args.quality} "
          f"jpeg_r={jpg.stat().st_size} B")
    print(f"encode best-of-{args.reps}: {min(enc):.2f} s "
          f"= {mp / min(enc):.3f} MP/s   (all: {[round(t, 2) for t in enc]})")
    print(f"decode->HLG/1010102 best-of-{args.reps}: {min(dec):.2f} s "
          f"= {mp / min(dec):.3f} MP/s   (all: {[round(t, 2) for t in dec]})")


if __name__ == "__main__":
    main()
