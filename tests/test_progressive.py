"""Progressive JPEG decode vs libjpeg (PIL) on generated streams.

Covers the T.81 G.2 paths the fixture alone doesn't pin down: grayscale,
4:4:4 and 4:2:0 sampling, restart intervals inside progressive scans, and
different quality (successive-approximation depth varies with content)."""

import io

import numpy as np
import pytest
from PIL import Image

from libultrahdr_tpu.jpeg import decode_to_planes, decode_to_rgba, parse_jpeg


def _scene_rgb(w, h, seed=0):
    rs = np.random.RandomState(seed)
    yy, xx = np.mgrid[0:h, 0:w].astype(np.float32)
    base = 0.5 + 0.4 * np.sin(xx / 23.0) * np.cos(yy / 17.0)
    tex = np.kron(rs.randn(h // 4 + 1, w // 4 + 1),
                  np.ones((4, 4)))[:h, :w] * 0.05
    r = np.clip(base + tex, 0, 1)
    g = np.clip(0.8 - 0.5 * base + tex, 0, 1)
    b = np.clip(0.3 + 0.6 * np.cos(xx / 31.0), 0, 1)
    return (np.stack([r, g, b], -1) * 255).astype(np.uint8)


def _progressive_bytes(img_arr, mode="RGB", quality=85, **save_kw):
    im = Image.fromarray(img_arr if mode == "RGB" else img_arr, mode)
    buf = io.BytesIO()
    im.save(buf, "JPEG", progressive=True, quality=quality, **save_kw)
    return buf.getvalue()


def _compare_rgb(data, tol_max=4, tol_mean=0.5):
    info = parse_jpeg(data)
    assert info.progressive
    pil = np.asarray(Image.open(io.BytesIO(data)).convert("RGB")).astype(int)
    packed = decode_to_rgba(data, info)
    ours = np.stack([(packed >> 0) & 0xFF, (packed >> 8) & 0xFF,
                     (packed >> 16) & 0xFF], -1).astype(int)
    diff = np.abs(ours - pil)
    assert diff.max() <= tol_max and diff.mean() < tol_mean


@pytest.mark.parametrize("quality", [50, 85, 95])
def test_progressive_rgb_420(quality):
    data = _progressive_bytes(_scene_rgb(200, 120), quality=quality,
                              subsampling=2)
    _compare_rgb(data)


def test_progressive_444():
    data = _progressive_bytes(_scene_rgb(96, 64, seed=3), quality=90,
                              subsampling=0)
    _compare_rgb(data)


def test_progressive_grayscale():
    g = _scene_rgb(128, 80, seed=5)[..., 0]
    data = _progressive_bytes(g, mode="L", quality=80)
    info = parse_jpeg(data)
    assert info.progressive and info.num_components == 1
    pil = np.asarray(Image.open(io.BytesIO(data)).convert("L")).astype(int)
    planes, fmt = decode_to_planes(data, info)
    diff = np.abs(planes[0][:80, :128].astype(int) - pil)
    assert diff.max() <= 4 and diff.mean() < 0.5


def test_progressive_with_restarts():
    data = _progressive_bytes(_scene_rgb(160, 96, seed=7), quality=88,
                              subsampling=2, restart_marker_rows=2)
    info = parse_jpeg(data)
    if not any(s["restart_interval"] for s in info.scans):
        pytest.skip("PIL build emitted no restart markers")
    _compare_rgb(data)


def test_progressive_odd_dims():
    data = _progressive_bytes(_scene_rgb(129, 67, seed=9), quality=85,
                              subsampling=2)
    _compare_rgb(data)
