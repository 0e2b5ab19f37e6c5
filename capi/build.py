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


def _sanitize() -> bool:
    # UHDR_CAPI_SANITIZE=1: ASan+UBSan builds of shim AND test exe (the
    # exe links the asan runtime so the sanitized shim loads cleanly);
    # tools/sanitize_replay.py drives this.
    return os.environ.get("UHDR_CAPI_SANITIZE") == "1"


_SAN_FLAGS = ["-O1", "-g", "-fsanitize=address,undefined",
              "-fno-sanitize-recover=all"]


def _cxx() -> str:
    """UHDR_TPU_CXX selects the compiler (CI clang configs)."""
    return os.environ.get("UHDR_TPU_CXX", "g++")


def build_shim() -> pathlib.Path:
    src = _DIR / "uhdr_capi.cpp"
    hdr = _DIR / "ultrahdr_tpu.h"
    tag = hashlib.sha256(src.read_bytes() + hdr.read_bytes()
                         + _cxx().encode()).hexdigest()[:16]
    name = f"libuhdr_tpu_{tag}_asan.so" if _sanitize() \
        else f"libuhdr_tpu_{tag}.so"
    so = _cache_dir() / name
    if so.exists():
        return so
    cflags, ldflags = python_embed_flags()
    opt = _SAN_FLAGS if _sanitize() else ["-O2"]
    tmp = so.with_suffix(".so.tmp")
    subprocess.run(
        [_cxx(), *opt, "-shared", "-fPIC", "-std=c++17", str(src),
         f"-I{_DIR}"] + cflags + ["-o", str(tmp)] + ldflags,
        check=True, capture_output=True)
    os.replace(tmp, so)
    return so


def build_test(shim: pathlib.Path) -> pathlib.Path:
    src = _DIR / "test_capi.c"
    tag = hashlib.sha256(src.read_bytes() + shim.name.encode()).hexdigest()[:16]
    exe = _cache_dir() / (f"test_capi_{tag}_asan" if _sanitize()
                          else f"test_capi_{tag}")
    if exe.exists():
        return exe
    opt = _SAN_FLAGS if _sanitize() else ["-O1"]
    tmp = exe.with_suffix(".tmp")
    cc = os.environ.get("UHDR_TPU_CC",
                        "clang" if "clang" in _cxx() else "gcc")
    subprocess.run(
        [cc, *opt, str(src), f"-I{_DIR}", str(shim),
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
