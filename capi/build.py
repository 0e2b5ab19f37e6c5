"""Build helper for the C ABI shim: compiles capi/uhdr_capi.cpp into
libuhdr_tpu.so (hash-cached, same scheme as jpeg/native.py) and the C test
program against it.

Usage:
    python -m capi.build            # build the shared library, print path
    python -m capi.build --test     # also build + run capi/test_capi.c
"""

from __future__ import annotations

import hashlib
import os
import pathlib
import subprocess
import sys
import sysconfig

_DIR = pathlib.Path(__file__).parent


def _cache_dir() -> pathlib.Path:
    d = pathlib.Path(os.environ.get(
        "UHDR_TPU_CACHE", os.path.expanduser("~/.cache/libultrahdr_tpu")))
    d.mkdir(parents=True, exist_ok=True)
    return d


def python_embed_flags() -> tuple[list[str], list[str]]:
    """(cflags, ldflags) for embedding this interpreter."""
    inc = sysconfig.get_path("include")
    libdir = sysconfig.get_config_var("LIBDIR") or ""
    ver = sysconfig.get_config_var("LDVERSION") or \
        f"{sys.version_info.major}.{sys.version_info.minor}"
    ld = [f"-L{libdir}", f"-lpython{ver}"]
    for extra in (sysconfig.get_config_var("LIBS") or "").split():
        ld.append(extra)
    return [f"-I{inc}"], ld


def build_shim() -> pathlib.Path:
    src = _DIR / "uhdr_capi.cpp"
    hdr = _DIR / "ultrahdr_tpu.h"
    tag = hashlib.sha256(src.read_bytes() + hdr.read_bytes()).hexdigest()[:16]
    so = _cache_dir() / f"libuhdr_tpu_{tag}.so"
    if so.exists():
        return so
    cflags, ldflags = python_embed_flags()
    tmp = so.with_suffix(".so.tmp")
    subprocess.run(
        ["g++", "-O2", "-shared", "-fPIC", "-std=c++17", str(src),
         f"-I{_DIR}"] + cflags + ["-o", str(tmp)] + ldflags,
        check=True, capture_output=True)
    os.replace(tmp, so)
    return so


def build_test(shim: pathlib.Path) -> pathlib.Path:
    src = _DIR / "test_capi.c"
    tag = hashlib.sha256(src.read_bytes() + shim.name.encode()).hexdigest()[:16]
    exe = _cache_dir() / f"test_capi_{tag}"
    if exe.exists():
        return exe
    tmp = exe.with_suffix(".tmp")
    subprocess.run(
        ["gcc", "-O1", str(src), f"-I{_DIR}", str(shim),
         f"-Wl,-rpath,{shim.parent}", "-o", str(tmp)],
        check=True, capture_output=True)
    os.replace(tmp, exe)
    return exe


def main() -> int:
    shim = build_shim()
    print(f"shim: {shim}")
    if "--test" in sys.argv:
        exe = build_test(shim)
        env = dict(os.environ)
        repo = str(_DIR.parent)
        env["PYTHONPATH"] = repo + os.pathsep + env.get("PYTHONPATH", "")
        r = subprocess.run([str(exe)], env=env)
        return r.returncode
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
