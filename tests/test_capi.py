"""C ABI shim round trip (capi/): builds libuhdr_tpu.so + a C test program
and runs the reference API walkthrough from C (ultrahdr_api.h:286-890).

The C program exercises: encoder create/setters/encode/get_stream,
is_uhdr_image, decoder create/set_image/probe/getters/decode, invalid-param
rejection, and pixel sanity of the decoded HDR output.
"""

import os
import pathlib
import shutil
import subprocess
import sys

import pytest

REPO = pathlib.Path(__file__).resolve().parent.parent


pytestmark = pytest.mark.slow  # embedded-interpreter C ABI flows


@pytest.mark.skipif(shutil.which("g++") is None or shutil.which("gcc") is None,
                    reason="native toolchain unavailable")
def test_capi_roundtrip():
    import sysconfig
    libdir = sysconfig.get_config_var("LIBDIR") or ""
    ver = sysconfig.get_config_var("LDVERSION") or ""
    if not any(pathlib.Path(libdir).glob(f"libpython{ver}*")):
        pytest.skip("no embeddable libpython")
    env = dict(os.environ)
    env["PYTHONPATH"] = str(REPO) + os.pathsep + env.get("PYTHONPATH", "")
    # hermetic: the embedded interpreter must not grab the real TPU
    # (conftest pins pytest itself to CPU the same way)
    env["JAX_PLATFORMS"] = "cpu"
    # ~6 min alone on this 1-core host (embedded-interpreter CPU-XLA
    # compiles of the fused programs dominate); headroom for co-tenant load
    r = subprocess.run([sys.executable, "-m", "capi.build", "--test"],
                       cwd=REPO, env=env, capture_output=True, text=True,
                       timeout=1800)
    assert r.returncode == 0, f"stdout={r.stdout}\nstderr={r.stderr}"
    assert "capi round-trip OK" in r.stdout
