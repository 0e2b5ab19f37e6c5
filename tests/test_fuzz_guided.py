"""Bounded runs of the coverage-guided fuzzer (fuzz/fuzz_parsers.py).

The CI-budget analog of the reference's cifuzz job
(/root/reference/.github/workflows/cifuzz.yml): a few thousand guided execs
per parser per run, asserting zero uncontrolled exceptions.  Long campaigns
run standalone: `python fuzz/fuzz_parsers.py --execs 1000000`."""

import pathlib
import subprocess
import sys

import pytest

FUZZ = pathlib.Path(__file__).resolve().parents[1] / "fuzz" / "fuzz_parsers.py"

# cheap byte-level parsers get more execs; stream-level targets fewer
BUDGETS = {"scan": 1500, "iso": 1500, "xmp": 800, "icc": 1500,
           "jpeg_parse": 800, "jpeg_decode": 150, "probe": 200}


pytestmark = pytest.mark.slow  # bounded guided-fuzz budget


@pytest.mark.parametrize("target", sorted(BUDGETS))
def test_guided_fuzz_clean(target):
    # subprocess: sys.monitoring line events must not fight pytest's own
    # tracing, and a crashing parser must not take down the test process
    r = subprocess.run(
        [sys.executable, str(FUZZ), "--target", target,
         "--execs", str(BUDGETS[target])],
        capture_output=True, text=True, timeout=420)
    assert r.returncode == 0, f"fuzz {target} found crashes:\n{r.stdout}\n{r.stderr}"
