"""Device entropy packer vs host C++ Huffman coder: bit-exact equivalence.

The XLA scan packer (jpeg/device_entropy.py) must produce the identical
byte stream to the sequential C++ coder (jpeg/_native/jpeg_entropy.cpp) at
restart_interval == mcus_w — same role as the reference's NEON-vs-scalar
equivalence tests (/root/reference/tests/gainmapmath_test.cpp:759)."""

import numpy as np
import pytest

from libultrahdr_tpu.jpeg import device_entropy, native
from libultrahdr_tpu.jpeg.tables import AC_CHROMA, AC_LUMA, DC_CHROMA, DC_LUMA


def _rand_coeffs(rs, bh, bw, density=0.1, lo=-1023, hi=1023):
    c = rs.randint(lo, hi + 1, (bh, bw, 64)).astype(np.int16)
    mask = rs.rand(bh, bw, 64) < density
    c = np.where(mask, c, 0).astype(np.int16)
    return c


def _host_scan(planes, sampling, mcus_w, mcus_h):
    comps = []
    for i, (p, (h, v)) in enumerate(zip(planes, sampling)):
        comps.append({"coeffs": p, "h": h, "v": v,
                      "dc_tbl": 0 if i == 0 else 1,
                      "ac_tbl": 0 if i == 0 else 1})
    n = len(planes)
    dc = [DC_LUMA, DC_CHROMA if n > 1 else None, None, None]
    ac = [AC_LUMA, AC_CHROMA if n > 1 else None, None, None]
    return native.encode_scan(comps, mcus_w, mcus_h, dc, ac,
                              restart_interval=mcus_w)


def _device_scan(planes, sampling, mcus_w, mcus_h):
    import jax.numpy as jnp
    layout = device_entropy.scan_layout(tuple(sampling), mcus_w, mcus_h)
    words, row_off = device_entropy.pack_scan_device(
        [jnp.asarray(p) for p in planes], layout)
    raw = np.asarray(device_entropy.words_to_bytes(words))
    return native.stuff_scan(raw, np.asarray(row_off))


CASES = [
    ("420", [(2, 2), (1, 1), (1, 1)], 5, 4),
    ("444", [(1, 1), (1, 1), (1, 1)], 7, 3),
    ("400", [(1, 1)], 9, 6),
]


@pytest.mark.parametrize("name,sampling,mcus_w,mcus_h", CASES)
@pytest.mark.parametrize("density", [0.0, 0.08, 0.5, 1.0])
def test_device_matches_host(name, sampling, mcus_w, mcus_h, density):
    rs = np.random.RandomState(hash((name, density)) % 2**31)
    planes = [_rand_coeffs(rs, mcus_h * v, mcus_w * h, density)
              for h, v in sampling]
    got = _device_scan(planes, sampling, mcus_w, mcus_h)
    want = _host_scan(planes, sampling, mcus_w, mcus_h)
    assert got == want


def test_extreme_values_and_long_runs():
    sampling = [(2, 2), (1, 1), (1, 1)]
    mcus_w, mcus_h = 4, 2
    rs = np.random.RandomState(3)
    planes = [_rand_coeffs(rs, mcus_h * v, mcus_w * h, 0.05)
              for h, v in sampling]
    # craft blocks exercising every edge: run 62 with 3 ZRLs, lone last
    # coefficient (no EOB), max magnitude, all-zero AC
    y = planes[0]
    y[0, 0, :] = 0
    y[0, 0, 0] = -1023
    y[0, 0, 63] = 1          # run 62 -> ZRL ZRL ZRL (14,1), then no EOB
    y[0, 1, :] = 0
    y[0, 1, 0] = 1016        # all-zero AC -> EOB only
    y[0, 2, :] = 0
    y[0, 2, 17] = -1         # run 16 -> ZRL + (0,1)
    y[0, 2, 33] = 1023       # run 15 -> (15,10), no ZRL
    assert _device_scan(planes, sampling, mcus_w, mcus_h) == \
        _host_scan(planes, sampling, mcus_w, mcus_h)


def test_dc_prediction_resets_per_row():
    sampling = [(1, 1)]
    mcus_w, mcus_h = 3, 3
    c = np.zeros((3, 3, 64), np.int16)
    c[:, :, 0] = np.arange(9).reshape(3, 3) * 100 - 400
    assert _device_scan([c], sampling, mcus_w, mcus_h) == \
        _host_scan([c], sampling, mcus_w, mcus_h)
