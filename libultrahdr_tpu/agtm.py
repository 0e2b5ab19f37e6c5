"""AGTM: gain-map generation from SMPTE 2094-50 dynamic tone-map metadata.

Re-design of /root/reference/lib/src/agtm.cpp (generateGainMap, :37-204):
per-rule gain curves become 1024-entry log2-gain LUTs evaluated with
monotone PCHIP interpolation, the per-pixel component mix / LUT lookup /
headroom interpolation / affine quantization run as one jit program.

The reference depends on the external `libsmpte2094-50` for its metadata
struct, PCHIP and implicit-parameter fill (CMakeLists.txt:378-392); here
the metadata model and PCHIP (Fritsch–Carlson monotone cubic Hermite) are
self-contained, so AGTM is always available rather than build-gated.
"""

from __future__ import annotations

import dataclasses
import functools

import jax
import jax.numpy as jnp
import numpy as np

from .errors import invalid_param
from .ops import colors, pixel
from .ops.lut_parity import GAIN_FACTOR_N
from .types import (ColorGamut, ColorTransfer, GainMapMetadata, ImgFmt,
                    RGB_FORMATS, RawImage)

N_LUT = GAIN_FACTOR_N  # kGainFactorNumEntries (gainmapmath.h:450)


@dataclasses.dataclass
class ComponentMix:
    """smpte2094_50::ComponentMix: weights picking the curve input."""

    rgb: tuple = (0.0, 0.0, 0.0)
    component: float = 0.0   # luma weight
    max: float = 0.0
    min: float = 0.0


@dataclasses.dataclass
class GainCurveRule:
    """One tone-mapping rule: target headroom + mix + PCHIP control points."""

    alternate_hdr_headroom_log2: float
    mix: ComponentMix
    curve: list   # [(x, y_log2gain), ...] with x in [0,1], increasing


@dataclasses.dataclass
class DynamicMetadata:
    """smpte2094_50::DynamicMetadata (the subset agtm.cpp consumes)."""

    baseline_hdr_headroom_log2: float
    rules: list = dataclasses.field(default_factory=list)


def pchip_coefficients(x: np.ndarray, y: np.ndarray):
    """Fritsch–Carlson monotone cubic Hermite slopes."""
    x = np.asarray(x, np.float64)
    y = np.asarray(y, np.float64)
    n = len(x)
    if n < 2 or np.any(np.diff(x) <= 0):
        raise invalid_param("gain curve needs >= 2 strictly increasing x")
    h = np.diff(x)
    delta = np.diff(y) / h
    d = np.zeros(n)
    if n == 2:
        d[:] = delta[0]
        return d
    # interior slopes: weighted harmonic mean where deltas share sign
    for k in range(1, n - 1):
        if delta[k - 1] * delta[k] <= 0:
            d[k] = 0.0
        else:
            w1 = 2 * h[k] + h[k - 1]
            w2 = h[k] + 2 * h[k - 1]
            d[k] = (w1 + w2) / (w1 / delta[k - 1] + w2 / delta[k])
    # endpoint slopes (shape-preserving one-sided)
    def _end(h0, h1, d0, d1):
        s = ((2 * h0 + h1) * d0 - h0 * d1) / (h0 + h1)
        if s * d0 <= 0:
            return 0.0
        if d0 * d1 < 0 and abs(s) > 3 * abs(d0):
            return 3 * d0
        return s
    d[0] = _end(h[0], h[1], delta[0], delta[1])
    d[-1] = _end(h[-1], h[-2], delta[-1], delta[-2])
    return d


def pchip_eval(x: np.ndarray, y: np.ndarray, q: np.ndarray) -> np.ndarray:
    """Evaluate the monotone PCHIP through (x, y) at points q (clamped)."""
    x = np.asarray(x, np.float64)
    y = np.asarray(y, np.float64)
    d = pchip_coefficients(x, y)
    q = np.clip(q, x[0], x[-1])
    i = np.clip(np.searchsorted(x, q, side="right") - 1, 0, len(x) - 2)
    h = x[i + 1] - x[i]
    t = (q - x[i]) / h
    h00 = (1 + 2 * t) * (1 - t) ** 2
    h10 = t * (1 - t) ** 2
    h01 = t * t * (3 - 2 * t)
    h11 = t * t * (t - 1)
    return (h00 * y[i] + h10 * h * d[i] + h01 * y[i + 1] + h11 * h * d[i + 1])


def _rule_lut(rule: GainCurveRule) -> np.ndarray:
    xs = np.array([c[0] for c in rule.curve])
    ys = np.array([c[1] for c in rule.curve])
    grid = np.arange(N_LUT, dtype=np.float64) / (N_LUT - 1)
    return pchip_eval(xs, ys, grid).astype(np.float32)


@functools.partial(jax.jit, static_argnames=("fmt", "cg", "lum_cg"))
def _agtm_pixels(vals, lut0, lut1, mix0, mix1, w01, log2_bounds, gamma, *,
                 fmt: ImgFmt, cg: ColorGamut, lum_cg: ColorGamut):
    """Per-pixel AGTM (agtm.cpp:25-35 applyMix + :150-195 loop), fused.

    vals: (3,H,W) unpacked gamma values; mix{0,1}: (6,) f32
    [r,g,b,luma,max,min]; w01: () interpolation weight toward lut1;
    log2_bounds: (2,3) [log2 min, log2 max] per channel."""
    if ImgFmt(fmt) in RGB_FORMATS:
        rgb = vals
    else:
        rgb = colors.yuv_to_rgb(vals, colors.yuv2rgb_matrix_for_gamut(cg))
    luma = colors.luminance(rgb, colors.luminance_coeffs_for_gamut(lum_cg))

    def mixed(mix):
        k_sum = jnp.sum(mix)
        x = (mix[0] * rgb[0] + mix[1] * rgb[1] + mix[2] * rgb[2]
             + mix[3] * luma)
        x = x + jnp.where(mix[4] > 0.0, mix[4] * jnp.max(rgb, axis=0), 0.0)
        x = x + jnp.where(mix[5] > 0.0, mix[5] * jnp.min(rgb, axis=0), 0.0)
        return jnp.where(k_sum == 0.0, luma, jnp.clip(x, 0.0, 1.0))

    def lookup(lut, mix):
        idx = (mixed(mix) * (N_LUT - 1) + 0.5).astype(jnp.int32)
        return jnp.take(lut, jnp.clip(idx, 0, N_LUT - 1))

    log_gain = (1.0 - w01) * lookup(lut0, mix0) + w01 * lookup(lut1, mix1)

    lo = log2_bounds[0].reshape(3, 1, 1)
    hi = log2_bounds[1].reshape(3, 1, 1)
    mapped = (log_gain[None] - lo) / (hi - lo)
    mapped = jnp.where(gamma.reshape(3, 1, 1) != 1.0,
                       jnp.power(jnp.maximum(mapped, 0.0),
                                 gamma.reshape(3, 1, 1)), mapped)
    return jnp.clip(mapped * 255.0 + 0.5, 0.0, 255.0).astype(jnp.uint8)


def generate_gainmap_agtm(image: RawImage, metadata: DynamicMetadata,
                          hdr_capacity_max: float = -1.0):
    """generateGainMap (agtm.cpp:37-204): full-resolution RGB888 gain map +
    gain-map metadata from dynamic tone-mapping rules."""
    evaluators = [dict(H=metadata.baseline_hdr_headroom_log2,
                       lut=np.zeros(N_LUT, np.float32),
                       mix=np.zeros(6, np.float32), baseline=True)]
    for rule in metadata.rules:
        m = rule.mix
        evaluators.append(dict(
            H=rule.alternate_hdr_headroom_log2, lut=_rule_lut(rule),
            mix=np.array([*m.rgb, m.component, m.max, m.min], np.float32),
            baseline=False))
    evaluators.sort(key=lambda e: e["H"])

    if hdr_capacity_max < 0.0:
        hdr_capacity_max = float(np.exp2(max(e["H"] for e in evaluators)))

    target_h = float(np.clip(np.log2(hdr_capacity_max),
                             evaluators[0]["H"], evaluators[-1]["H"]))
    idx = 0
    for i in range(len(evaluators) - 1):
        if evaluators[i]["H"] <= target_h <= evaluators[i + 1]["H"]:
            idx = i
            break
    if len(evaluators) > 1:
        ev0, ev1 = evaluators[idx], evaluators[idx + 1]
        w01 = 0.0 if ev1["H"] == ev0["H"] else \
            (target_h - ev0["H"]) / (ev1["H"] - ev0["H"])
    else:
        ev0 = ev1 = evaluators[0]
        w01 = 0.0

    md = GainMapMetadata()
    md.hdr_capacity_min = 1.0
    md.hdr_capacity_max = hdr_capacity_max
    md.min_content_boost[:] = 1.0
    md.max_content_boost[:] = hdr_capacity_max
    md.gamma[:] = 1.0
    md.offset_sdr[:] = 0.0
    md.offset_hdr[:] = 0.0

    lo = np.log2(np.asarray(md.min_content_boost, np.float32))
    hi = np.log2(np.asarray(md.max_content_boost, np.float32))
    hi = np.where(np.abs(hi - lo) < np.finfo(np.float32).eps, hi + 1e-4, hi)

    vals = pixel.unpack(image)
    gm = _agtm_pixels(
        vals, jnp.asarray(ev0["lut"]), jnp.asarray(ev1["lut"]),
        jnp.asarray(ev0["mix"] if not ev0["baseline"]
                    else np.zeros(6, np.float32)),
        jnp.asarray(ev1["mix"] if not ev1["baseline"]
                    else np.zeros(6, np.float32)),
        jnp.float32(w01), jnp.asarray(np.stack([lo, hi])),
        jnp.asarray(md.gamma, jnp.float32),
        fmt=ImgFmt(image.fmt), cg=ColorGamut(image.cg),
        lum_cg=ColorGamut(image.cg))
    # baseline evaluators contribute log-gain 0 regardless of mix; encode
    # that by their zero LUTs (lookup of a zero table is 0 like agtm.cpp's
    # is_baseline short-circuit)
    gm_np = np.moveaxis(np.asarray(gm), 0, -1)
    gm_img = RawImage(ImgFmt.RGB888, image.cg, image.ct, image.range,
                      image.w, image.h, [np.ascontiguousarray(gm_np)])
    return gm_img, md
