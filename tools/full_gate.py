#!/usr/bin/env python3
"""Segmented full-suite gate: the whole test tier, green, in one command.

The reference gates every PR on its full ctest suite in CI
(/root/reference/.github/workflows/cmake_linux.yml:15-77).  This repo's
analog is `python tools/full_gate.py`: it runs every test file in its own
short-lived pytest process and aggregates the results into one log +
pass/fail verdict (exit 0 only if every segment is green).

Why segmented instead of one `pytest tests/`: XLA's CPU backend has an
upstream crash (SIGSEGV inside compilation / executable serialization)
that only reproduces hundreds of tests into a single long-lived process —
observed at test ~404/437 in plain-pytest runs, in whichever program
happens to compile late (tracked in ROADMAP.md).  One process per test
file keeps every process minutes-short, which sidesteps the crash
deterministically while testing the exact same code.  The persistent
XLA compile cache (tests/conftest.py) makes the re-imports cheap: the
full tier completes in one sitting on a 1-core host.

A segment that dies on a signal (not an ordinary test failure) is retried
once in a fresh process — by then its programs are in the compile cache,
so a recurrence would be a real bug and fails the gate.

Usage:
  python tools/full_gate.py                 # full tier, log to stdout
  python tools/full_gate.py --log TESTRUN_r05.txt
  python tools/full_gate.py --files tests/test_ops.py ...   # subset
"""

from __future__ import annotations

import argparse
import glob
import os
import re
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

_SUMMARY_RE = re.compile(
    r"(?:(\d+) passed)?(?:, )?(?:(\d+) skipped)?(?:, )?(?:(\d+) xfailed)?"
)


def _counts(output: str):
    """Extract (passed, failed, skipped, errors) from pytest output."""
    got = dict(passed=0, failed=0, skipped=0, xfailed=0, xpassed=0,
               errors=0, deselected=0)
    # the final summary line looks like: "== 12 passed, 1 skipped in 3.2s =="
    for m in re.finditer(r"(\d+) (passed|failed|skipped|xfailed|xpassed|"
                         r"error(?:s)?|deselected)", output):
        key = m.group(2).rstrip("s") if m.group(2).startswith("error") \
            else m.group(2)
        key = "errors" if key == "error" else key
        got[key] = max(got[key], int(m.group(1)))
    return got


def run_segment(path: str, extra: list[str], log) -> tuple[bool, dict, bool]:
    """Run one test file in its own process.

    Returns (green, counts, crashed) — crashed means the process died on a
    signal rather than reporting test results.
    """
    cmd = [sys.executable, "-m", "pytest", path, "-q", "--no-header",
           *extra]
    t0 = time.time()
    proc = subprocess.run(cmd, cwd=REPO, stdout=subprocess.PIPE,
                          stderr=subprocess.STDOUT, text=True)
    dt = time.time() - t0
    out = proc.stdout
    crashed = proc.returncode < 0 or proc.returncode >= 128
    counts = _counts(out)
    green = proc.returncode == 0
    # pytest exit 5 = no tests collected (e.g. everything deselected): treat
    # as green-but-empty so marker-filtered runs don't fail the gate.
    if proc.returncode == 5:
        green = True
    tag = "ok" if green else ("CRASH" if crashed else "FAIL")
    line = (f"[{tag:>5}] {path:<44} {dt:7.1f}s  "
            f"{counts['passed']} passed, {counts['failed']} failed, "
            f"{counts['skipped']} skipped")
    print(line, flush=True)
    log.write(line + "\n")
    if not green:
        log.write(out + "\n")
    return green, counts, crashed


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--log", default=None, help="also append the gate log "
                    "and per-segment failures to this file")
    ap.add_argument("--files", nargs="*", default=None)
    ap.add_argument("pytest_args", nargs="*", default=[],
                    help="extra args forwarded to every pytest segment")
    args = ap.parse_args()

    files = args.files or sorted(glob.glob(os.path.join(REPO, "tests",
                                                        "test_*.py")))
    files = [os.path.relpath(f, REPO) for f in files]

    log = open(args.log, "w") if args.log else open(os.devnull, "w")
    hdr = (f"full_gate: {len(files)} test files, python {sys.version.split()[0]}, "
           f"started {time.strftime('%Y-%m-%d %H:%M:%S')}")
    print(hdr, flush=True)
    log.write(hdr + "\n")

    total = dict(passed=0, failed=0, skipped=0, xfailed=0, xpassed=0,
                 errors=0)
    t0 = time.time()
    bad: list[str] = []
    for path in files:
        green, counts, crashed = run_segment(path, args.pytest_args, log)
        if not green and crashed:
            note = f"        segment crashed (signal) — retrying once: {path}"
            print(note, flush=True)
            log.write(note + "\n")
            green, counts, crashed = run_segment(path, args.pytest_args, log)
        for k in total:
            total[k] += counts.get(k, 0)
        if not green:
            bad.append(path)

    dt = time.time() - t0
    verdict = "GREEN" if not bad else f"RED ({len(bad)} segment(s) failed)"
    summary = (f"full_gate {verdict}: {total['passed']} passed, "
               f"{total['failed']} failed, {total['skipped']} skipped, "
               f"{total['xfailed']} xfailed in {dt:.0f}s"
               + (f"\n  failing: {', '.join(bad)}" if bad else ""))
    print(summary, flush=True)
    log.write(summary + "\n")
    log.close()
    return 0 if not bad else 1


if __name__ == "__main__":
    sys.exit(main())
