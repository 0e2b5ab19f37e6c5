"""Java/JNI binding: no-JDK syntax gate + (JDK-gated) build & round trip.

The binding closes the last SURVEY.md §2 component row (reference:
java/com/google/media/codecs/ultrahdr/*.java + java/jni/ultrahdr-jni.cpp).
Without a JDK on the host, the JNI C++ still gets a full -Wall -Werror
syntax compile against the stub jni.h, and the Java sources get a
structural lint; with one, the real build + an encode/decode round trip
run.
"""

import pathlib
import re
import shutil
import subprocess
import sys

import numpy as np
import pytest

REPO = pathlib.Path(__file__).resolve().parent.parent
JAVA = REPO / "java"


def test_jni_shim_syntax():
    """g++ -fsyntax-only against the stub jni.h — catches type and
    signature errors in the shim without a JDK."""
    subprocess.run(
        [sys.executable, str(JAVA / "build.py"), "--syntax-only"],
        check=True, cwd=REPO)


def _native_names(java_file: pathlib.Path) -> list[str]:
    src = java_file.read_text()
    pat = re.compile(
        r"native\s+[\w\[\]]+\s+(\w+)\s*\(", re.S)
    return pat.findall(src)


@pytest.mark.parametrize("cls", ["UltraHDRCommon", "UltraHDREncoder",
                                 "UltraHDRDecoder"])
def test_every_java_native_has_a_jni_export(cls):
    """Every `native` method declared in the Java classes must have a
    correspondingly-named JNI export in uhdr_jni.cpp (the Java classes use
    distinct native names, so the mapping is exact, no overload
    mangling)."""
    jf = JAVA / "com/google/media/codecs/ultrahdr" / f"{cls}.java"
    cpp = (JAVA / "jni/uhdr_jni.cpp").read_text()
    names = _native_names(jf)
    assert names, f"no native methods found in {cls}"
    for n in names:
        sym = f"Java_com_google_media_codecs_ultrahdr_{cls}_{n}"
        assert sym in cpp, f"missing JNI export {sym}"


def test_java_api_surface_matches_reference_binding():
    """The public method names of the reference binding
    (UltraHDREncoder.java:95-501, UltraHDRDecoder.java:35-470) must all
    exist in ours — a user of the reference binding can switch without
    source changes."""
    expected = {
        "UltraHDREncoder": [
            "setRawImage", "setCompressedImage", "setGainMapImageInfo",
            "setExifData", "setQualityFactor",
            "setMultiChannelGainMapEncoding", "setGainMapScaleFactor",
            "setGainMapGamma", "setEncPreset", "setOutputFormat",
            "setMinMaxContentBoost", "setTargetDisplayPeakBrightness",
            "encode", "getOutput", "reset", "close"],
        "UltraHDRDecoder": [
            "isUHDRImage", "setCompressedImage", "setOutputFormat",
            "setColorTransfer", "setMaxDisplayBoost",
            "enableGpuAcceleration", "probe", "getImageWidth",
            "getImageHeight", "getGainMapWidth", "getGainMapHeight",
            "getExif", "getIcc", "getBaseImage", "getGainMapImage",
            "getGainmapMetadata", "decode", "getDecodedImage",
            "getDecodedGainMapImage", "reset", "close"],
        "UltraHDRCommon": ["getVersionString", "getVersion"],
    }
    for cls, methods in expected.items():
        src = (JAVA / "com/google/media/codecs/ultrahdr"
               / f"{cls}.java").read_text()
        for m in methods:
            assert re.search(rf"public[\w\s\[\]]*\s{m}\s*\(", src), \
                f"{cls} missing public method {m}"


@pytest.mark.skipif(shutil.which("javac") is None,
                    reason="no JDK on this host")
def test_java_roundtrip_with_jdk(tmp_path):
    """Full build + encode/decode round trip through the JVM (runs only
    where a JDK exists)."""
    out = tmp_path / "out"
    subprocess.run([sys.executable, str(JAVA / "build.py"),
                    "--out", str(out)], check=True, cwd=REPO)

    w, h = 96, 64
    rs = np.random.RandomState(7)
    y = (rs.randint(0, 1024, (h, w)).astype("<u2") << 6)
    uv = (rs.randint(300, 700, (h // 2, w)).astype("<u2") << 6)
    p010 = tmp_path / "in.p010"
    p010.write_bytes(y.tobytes() + uv.tobytes())

    env = {"LD_LIBRARY_PATH": str(out),
           "PYTHONPATH": str(REPO)}
    import os
    env = {**os.environ, **env}
    subprocess.run(
        ["java", "-cp", f"{out}/classes",
         f"-Djava.library.path={out}", "UltraHdrApp", "encode",
         str(p010), str(w), str(h), str(tmp_path / "out.jpg")],
        check=True, env=env)
    data = (tmp_path / "out.jpg").read_bytes()

    from libultrahdr_tpu.jpegr import is_uhdr_image
    assert is_uhdr_image(data)

    subprocess.run(
        ["java", "-cp", f"{out}/classes",
         f"-Djava.library.path={out}", "UltraHdrApp", "decode",
         str(tmp_path / "out.jpg"), str(tmp_path / "out.raw")],
        check=True, env=env)
    raw = np.fromfile(tmp_path / "out.raw", dtype="<u4")
    assert raw.size == w * h
