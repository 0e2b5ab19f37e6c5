"""Build the Java binding: javac the classes + g++ the JNI shim.

Usage: python java/build.py [--out DIR]

Needs a JDK (javac + $JAVA_HOME/include/jni.h) and the C ABI shim
(capi/build.py builds libuhdr_tpu.so on demand).  Produces in --out
(default java/out): ultrahdr.jar-equivalent class tree + libuhdr_tpu_jni.so.

Without a JDK, --syntax-only compiles the JNI C++ against the stub jni.h
(java/jni/stub) as a no-JDK syntax gate; tests/test_java_binding.py runs it.
"""

from __future__ import annotations

import argparse
import os
import pathlib
import shutil
import subprocess
import sys

_DIR = pathlib.Path(__file__).resolve().parent
_REPO = _DIR.parent

JAVA_SOURCES = [
    _DIR / "com/google/media/codecs/ultrahdr/UltraHDRCommon.java",
    _DIR / "com/google/media/codecs/ultrahdr/UltraHDREncoder.java",
    _DIR / "com/google/media/codecs/ultrahdr/UltraHDRDecoder.java",
]


def find_java_home() -> pathlib.Path | None:
    jh = os.environ.get("JAVA_HOME")
    if jh and (pathlib.Path(jh) / "include/jni.h").exists():
        return pathlib.Path(jh)
    javac = shutil.which("javac")
    if javac:
        home = pathlib.Path(os.path.realpath(javac)).parent.parent
        if (home / "include/jni.h").exists():
            return home
    return None


def syntax_check() -> None:
    """Compile the JNI shim against the stub jni.h (no JDK required)."""
    subprocess.run(
        [os.environ.get("UHDR_TPU_CXX", "g++"),
         "-fsyntax-only", "-std=c++17", "-Wall", "-Werror",
         f"-I{_DIR / 'jni' / 'stub'}", f"-I{_REPO / 'capi'}",
         str(_DIR / "jni" / "uhdr_jni.cpp")],
        check=True)


def build(out: pathlib.Path) -> None:
    java_home = find_java_home()
    if java_home is None:
        raise RuntimeError("no JDK found (need javac and jni.h); "
                           "run with --syntax-only for the no-JDK gate")
    out.mkdir(parents=True, exist_ok=True)
    classes = out / "classes"
    classes.mkdir(exist_ok=True)
    subprocess.run(
        [str(java_home / "bin/javac"), "-d", str(classes)]
        + [str(s) for s in JAVA_SOURCES] + [str(_DIR / "UltraHdrApp.java")],
        check=True)

    from capi.build import build_shim  # noqa: E402 (repo-root import)
    shim = build_shim()

    plat_inc = next((java_home / "include").glob("linux"), None) \
        or next((java_home / "include").glob("darwin"),
                java_home / "include")
    subprocess.run(
        [os.environ.get("UHDR_TPU_CXX", "g++"),
         "-O2", "-shared", "-fPIC", "-std=c++17",
         str(_DIR / "jni" / "uhdr_jni.cpp"),
         f"-I{java_home / 'include'}", f"-I{plat_inc}",
         f"-I{_REPO / 'capi'}",
         str(shim), f"-Wl,-rpath,{shim.parent}",
         "-o", str(out / "libuhdr_tpu_jni.so")],
        check=True)
    print(f"built {out / 'libuhdr_tpu_jni.so'} + classes in {classes}")


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default=str(_DIR / "out"))
    ap.add_argument("--syntax-only", action="store_true")
    args = ap.parse_args()
    if args.syntax_only:
        syntax_check()
        print("JNI shim syntax check OK")
        return 0
    sys.path.insert(0, str(_REPO))
    build(pathlib.Path(args.out))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
