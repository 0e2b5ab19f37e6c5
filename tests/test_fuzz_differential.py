"""Differential probe fuzzing vs the reference libuhdr.so (bounded run).

Gate: zero crashes AND zero streams the reference probe accepts that ours
rejects (fuzz/differential.py).  Skipped when the reference library is not
built (see .claude/skills/verify/SKILL.md)."""

import os
import pathlib
import subprocess
import sys

import pytest

DIFF = pathlib.Path(__file__).resolve().parents[1] / "fuzz" / "differential.py"

pytestmark = pytest.mark.skipif(not os.path.exists("/tmp/refbuild/libuhdr.so"),
                                reason="reference libuhdr.so not built")


def test_differential_probe_clean():
    r = subprocess.run([sys.executable, str(DIFF), "--execs", "400"],
                       capture_output=True, text=True, timeout=420)
    assert r.returncode == 0, f"differential mismatches:\n{r.stdout}\n{r.stderr}"
