"""Parser robustness: mutated/truncated streams must fail cleanly.

The analog of the reference's libFuzzer targets
(/root/reference/fuzzer/ultrahdr_dec_fuzzer.cpp:31-60): any byte-level
corruption of a JPEG_R stream must surface as a UhdrError (or a clean
False/None), never an uncontrolled exception or crash."""

import numpy as np
import pytest

from libultrahdr_tpu import (ColorGamut, ColorRange, ColorTransfer, ImgFmt,
                             ImgLabel, RawImage, UhdrDecoder, UhdrEncoder,
                             UhdrError)
from libultrahdr_tpu.jpegr import is_uhdr_image


pytestmark = pytest.mark.slow  # randomized parser sweeps


@pytest.fixture(scope="module")
def encoded():
    rs = np.random.RandomState(5)
    w, h = 96, 48
    y = (rs.randint(0, 1024, (h, w)).astype(np.uint16) << 6)
    uv = (rs.randint(0, 1024, (h // 2, w)).astype(np.uint16) << 6)
    img = RawImage(ImgFmt.P010, ColorGamut.BT2100, ColorTransfer.HLG,
                   ColorRange.FULL, w, h, [y, uv])
    enc = UhdrEncoder()
    enc.set_raw_image(img, ImgLabel.HDR)
    enc.set_gainmap_scale_factor(2)
    return enc.encode()


def _try_decode(data: bytes):
    dec = UhdrDecoder()
    try:
        dec.set_image(data)
        dec.set_out_img_format(ImgFmt.RGBA1010102)
        dec.set_out_color_transfer(ColorTransfer.HLG)
        dec.decode()
    except UhdrError:
        pass  # clean, coded failure
    # any other exception type propagates and fails the test


def test_truncations(encoded):
    n = len(encoded)
    for cut in [0, 1, 2, 3, 16, n // 4, n // 2, n - 100, n - 1]:
        _try_decode(encoded[:cut])
        assert isinstance(is_uhdr_image(encoded[:cut]), bool)


def test_byte_flips(encoded):
    rs = np.random.RandomState(0)
    data = bytearray(encoded)
    for trial in range(40):
        mutated = bytearray(data)
        for _ in range(rs.randint(1, 8)):
            pos = rs.randint(0, len(mutated))
            mutated[pos] ^= 1 << rs.randint(0, 8)
        _try_decode(bytes(mutated))


def test_segment_scrambles(encoded):
    rs = np.random.RandomState(1)
    for trial in range(20):
        # chop at a random point and splice random bytes in
        a = rs.randint(0, len(encoded))
        blob = rs.bytes(rs.randint(0, 64))
        _try_decode(encoded[:a] + blob + encoded[a:])


def test_garbage_inputs():
    rs = np.random.RandomState(2)
    for size in (0, 1, 2, 4, 100, 4096):
        _try_decode(rs.bytes(size))
        _try_decode(b"\xff\xd8" + rs.bytes(size))
        _try_decode(b"\xff\xd8\xff\xe0" + rs.bytes(size))


def test_metadata_mutations(encoded):
    """Flip bytes specifically inside the ISO 21496-1 APP2 payload."""
    iso_sig = b"urn:iso:std:iso:ts:21496:-1"
    pos = encoded.find(iso_sig)
    assert pos > 0
    for delta in range(0, 40, 3):
        mutated = bytearray(encoded)
        p = pos + len(iso_sig) + 1 + delta
        if p < len(mutated):
            mutated[p] ^= 0xFF
            _try_decode(bytes(mutated))
