"""Vectorized color science primitives (OETF/EOTF/OOTF, gamuts, YUV).

TPU-native re-design of the reference's per-pixel scalar functions in
/root/reference/lib/src/gainmapmath.cpp (sRGB :114-152, HLG :238-306,
PQ :309-349, gamut matrices :603-615, YUV matrices :638-674,
luminance :86-88/:160-162/:185-187, RGB<->YUV :96-110/:167-182/:196-234).

Everything here is a jax-traceable function over arrays with channels on the
LEADING axis — shape (3, ...) — so image H,W land on TPU sublane/lane dims and
gamut conversions become a single (3,3) contraction the compiler fuses into
neighboring pointwise work.  The reference's LUT variants (USE_*_LUT,
gainmapmath.h:27-32) are replaced by exact math: TPU VPU transcendentals are
cheap and exact math is strictly more accurate than the reference's 2^10-2^16
entry tables (reference tests allow 1e-4; LUT-vs-exact already differs less).

All functions accept float32 arrays; scalars work through jnp broadcasting.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

# nominal {SDR, HLG, PQ} peak display luminance in nits (gainmapmath.h:44-48)
SDR_WHITE_NITS = 203.0
HLG_MAX_NITS = 1000.0
PQ_MAX_NITS = 10000.0

# gain computation offsets (gainmapmath.h:549-550)
HDR_OFFSET = 1e-7
SDR_OFFSET = 1e-7

# maximum normalized pixel value for linear-HDR float intent (gainmapmath.h:577)
MAX_PIXEL_FLOAT_HDR_LINEAR = PQ_MAX_NITS / SDR_WHITE_NITS


def reference_display_peak_nits(ct) -> float:
    """getReferenceDisplayPeakLuminanceInNits (gainmapmath.cpp:18-34)."""
    from ..types import ColorTransfer
    return {
        ColorTransfer.LINEAR: PQ_MAX_NITS,
        ColorTransfer.HLG: HLG_MAX_NITS,
        ColorTransfer.PQ: PQ_MAX_NITS,
        ColorTransfer.SRGB: SDR_WHITE_NITS,
    }.get(ColorTransfer(ct), -1.0)


# ---------------------------------------------------------------------------
# Luminance (gamut-specific luma coefficients)

# IEC 61966-2-1/Amd 1:2003 Eq F.7 (gainmapmath.cpp:86)
K_SRGB = np.array([0.212639, 0.715169, 0.072192], np.float32)
# SMPTE EG 432-1 Eq G-7 (gainmapmath.cpp:157)
K_P3 = np.array([0.2289746, 0.6917385, 0.0792869], np.float32)
# ITU-R BT.2100-2 Table 5 (gainmapmath.cpp:185)
K_BT2100 = np.array([0.2627, 0.677998, 0.059302], np.float32)


def luminance(rgb, coeffs):
    """Weighted channel sum; rgb shape (3, ...) -> (...)."""
    c = jnp.asarray(coeffs, jnp.float32)
    return c[0] * rgb[0] + c[1] * rgb[1] + c[2] * rgb[2]


def srgb_luminance(rgb):
    return luminance(rgb, K_SRGB)


def p3_luminance(rgb):
    return luminance(rgb, K_P3)


def bt2100_luminance(rgb):
    return luminance(rgb, K_BT2100)


def luminance_coeffs_for_gamut(cg) -> np.ndarray:
    """getLuminanceFn (gainmapmath.cpp:1149-1162)."""
    from ..types import ColorGamut
    return {ColorGamut.BT709: K_SRGB,
            ColorGamut.DISPLAY_P3: K_P3,
            ColorGamut.BT2100: K_BT2100}[ColorGamut(cg)]


# ---------------------------------------------------------------------------
# RGB <-> YUV analog (gamma-encoded) conversions.
#
# The reference derives per-gamut Cb/Cr scale constants (gainmapmath.cpp:
# srgb :94-110, p3 :163-182 [BT.601 luma!], bt2100 :191-234).  We express
# each as a 3x3 matrix so the conversion is one fused contraction.

def _rgb2yuv_matrix(kr: float, kg: float, kb: float) -> np.ndarray:
    cb = 2.0 * (1.0 - kb)
    cr = 2.0 * (1.0 - kr)
    return np.array([
        [kr, kg, kb],
        [-kr / cb, -kg / cb, (1.0 - kb) / cb],
        [(1.0 - kr) / cr, -kg / cr, -kb / cr],
    ], np.float32)


def _yuv2rgb_matrix(kr: float, kg: float, kb: float) -> np.ndarray:
    cb = 2.0 * (1.0 - kb)
    cr = 2.0 * (1.0 - kr)
    return np.array([
        [1.0, 0.0, cr],
        [1.0, -kb * cb / kg, -kr * cr / kg],
        [1.0, cb, 0.0],
    ], np.float32)


# sRGB uses BT.709 luma coefficients (== its luminance coeffs)
SRGB_RGB2YUV = _rgb2yuv_matrix(*K_SRGB)
SRGB_YUV2RGB = _yuv2rgb_matrix(*K_SRGB)
# Display-P3 luma uses BT.601 coefficients (gainmapmath.cpp:166-168)
P3_YUV_KR, P3_YUV_KG, P3_YUV_KB = 0.299, 0.587, 0.114
P3_RGB2YUV = _rgb2yuv_matrix(P3_YUV_KR, P3_YUV_KG, P3_YUV_KB)
P3_YUV2RGB = _yuv2rgb_matrix(P3_YUV_KR, P3_YUV_KG, P3_YUV_KB)
# BT.2100 luma == its luminance coeffs
BT2100_RGB2YUV = _rgb2yuv_matrix(*K_BT2100)
BT2100_YUV2RGB = _yuv2rgb_matrix(*K_BT2100)


def apply_3x3(m, x):
    """(3,3) @ (3, ...) -> (3, ...) as unrolled multiply-adds.

    The matrix must be a compile-time constant (numpy).  Unrolling keeps the
    conversion on the VPU in exact f32 and lets XLA fuse it into adjacent
    pointwise work — a dot_general here would route through the MXU at
    default (reduced) precision."""
    m = np.asarray(m, np.float32)
    return jnp.stack([
        float(m[i, 0]) * x[0] + float(m[i, 1]) * x[1] + float(m[i, 2]) * x[2]
        for i in range(3)])


def rgb_to_yuv(rgb, matrix):
    return apply_3x3(matrix, rgb)


def yuv_to_rgb(yuv, matrix, clamp=True):
    """YUV->RGB; reference clamps each channel to [0,1] (clampPixelFloat,
    gainmapmath.cpp:107-110/:178-182/:228-234)."""
    rgb = apply_3x3(matrix, yuv)
    if clamp:
        rgb = jnp.clip(rgb, 0.0, 1.0)
    return rgb


def yuv2rgb_matrix_for_gamut(cg) -> np.ndarray:
    """getYuvToRgbFn (gainmapmath.cpp:1135-1147): sRGB->BT709 matrix,
    P3->BT601-style matrix, BT2100->BT2100 matrix."""
    from ..types import ColorGamut
    return {ColorGamut.BT709: SRGB_YUV2RGB,
            ColorGamut.DISPLAY_P3: P3_YUV2RGB,
            ColorGamut.BT2100: BT2100_YUV2RGB}[ColorGamut(cg)]


def rgb2yuv_matrix_for_gamut(cg) -> np.ndarray:
    from ..types import ColorGamut
    return {ColorGamut.BT709: SRGB_RGB2YUV,
            ColorGamut.DISPLAY_P3: P3_RGB2YUV,
            ColorGamut.BT2100: BT2100_RGB2YUV}[ColorGamut(cg)]


# ---------------------------------------------------------------------------
# Transfer functions.  Domain/range [0, 1] unless noted.

def srgb_inv_oetf(e_gamma):
    """sRGB EOTF, IEC 61966-2-1 Eq F.5/F.6 (gainmapmath.cpp:114-125)."""
    e_gamma = jnp.asarray(e_gamma, jnp.float32)
    lo = e_gamma / 12.92
    hi = jnp.power(jnp.maximum((e_gamma + 0.055) / 1.055, 0.0), 2.4)
    return jnp.where(e_gamma <= 0.04045, lo, hi)


def srgb_oetf(e):
    """sRGB OETF, IEC 61966-2-1 Eq F.10/F.11 (gainmapmath.cpp:140-150)."""
    e = jnp.asarray(e, jnp.float32)
    lo = 12.92 * e
    hi = 1.055 * jnp.power(jnp.maximum(e, 1e-37), 1.0 / 2.4) - 0.055
    return jnp.where(e <= 0.0031308, lo, hi)


_HLG_A, _HLG_B, _HLG_C = 0.17883277, 0.28466892, 0.55991073


def hlg_oetf(e):
    """HLG OETF, ITU-R BT.2100-2 Table 5 (gainmapmath.cpp:238-247)."""
    e = jnp.asarray(e, jnp.float32)
    lo = jnp.sqrt(jnp.maximum(3.0 * e, 0.0))
    hi = _HLG_A * jnp.log(jnp.maximum(12.0 * e - _HLG_B, 1e-37)) + _HLG_C
    return jnp.where(e <= 1.0 / 12.0, lo, hi)


def hlg_inv_oetf(e_gamma):
    """HLG inverse OETF (gainmapmath.cpp:262-270)."""
    e_gamma = jnp.asarray(e_gamma, jnp.float32)
    lo = jnp.square(e_gamma) / 3.0
    hi = (jnp.exp((e_gamma - _HLG_C) / _HLG_A) + _HLG_B) / 12.0
    return jnp.where(e_gamma <= 0.5, lo, hi)


_OOTF_GAMMA = 1.2  # BT.2100-2 Table 5 Note 5f for a 1000-nit display


def hlg_ootf(rgb, lum_coeffs):
    """HLG reference OOTF (gainmapmath.cpp:288-291).

    NB: the codec pipelines never use this — getOotfFn binds the
    per-channel approximation (hlg_ootf_approx below); kept for parity
    with the reference's exported math surface."""
    y = luminance(rgb, lum_coeffs)
    return rgb * jnp.power(jnp.maximum(y, 1e-37), _OOTF_GAMMA - 1.0)


def hlg_ootf_approx(rgb):
    """hlgOotfApprox (gainmapmath.cpp:293-295): per-channel pow(1.2).

    This is what getOotfFn(UHDR_CT_HLG) actually returns
    (gainmapmath.cpp:1191-1192), i.e. what toneMap and generateGainMap
    apply to HLG scene light."""
    return jnp.power(jnp.maximum(rgb, 0.0), _OOTF_GAMMA)


def hlg_inverse_ootf(rgb, lum_coeffs):
    """HLG inverse OOTF (gainmapmath.cpp:301-305)."""
    y = luminance(rgb, lum_coeffs)
    return rgb * jnp.power(jnp.maximum(y, 1e-37), (1.0 / _OOTF_GAMMA) - 1.0)


_PQ_M1 = 2610.0 / 16384.0
_PQ_M2 = 2523.0 / 4096.0 * 128.0
_PQ_C1 = 3424.0 / 4096.0
_PQ_C2 = 2413.0 / 4096.0 * 32.0
_PQ_C3 = 2392.0 / 4096.0 * 32.0


def pq_oetf(e):
    """PQ OETF, ITU-R BT.2100-2 Table 4 (gainmapmath.cpp:313-318)."""
    e = jnp.asarray(e, jnp.float32)
    ep = jnp.power(jnp.maximum(e, 0.0), _PQ_M1)
    v = jnp.power((_PQ_C1 + _PQ_C2 * ep) / (1.0 + _PQ_C3 * ep), _PQ_M2)
    return jnp.where(e <= 0.0, 0.0, v)


def pq_inv_oetf(e_gamma):
    """PQ inverse OETF (gainmapmath.cpp:333-336)."""
    e_gamma = jnp.asarray(e_gamma, jnp.float32)
    val = jnp.power(jnp.maximum(e_gamma, 0.0), 1.0 / _PQ_M2)
    num = jnp.maximum(val - _PQ_C1, 0.0)
    den = _PQ_C2 - _PQ_C3 * val
    return jnp.power(num / den, 1.0 / _PQ_M1)


def inv_oetf(e_gamma, ct):
    """getInverseOetfFn (gainmapmath.cpp:1188-1203). LINEAR clamps to [0,1]."""
    from ..types import ColorTransfer
    ct = ColorTransfer(ct)
    if ct == ColorTransfer.LINEAR:
        return jnp.clip(jnp.asarray(e_gamma, jnp.float32), 0.0, 1.0)
    if ct == ColorTransfer.HLG:
        return hlg_inv_oetf(e_gamma)
    if ct == ColorTransfer.PQ:
        return pq_inv_oetf(e_gamma)
    if ct == ColorTransfer.SRGB:
        return srgb_inv_oetf(e_gamma)
    raise ValueError(f"no inverse oetf for {ct}")


def ootf(rgb, ct, lum_coeffs):
    """getOotfFn (gainmapmath.cpp:1187-1201): HLG applies the per-channel
    OOTF approximation (hlgOotfApprox), others are identity.  lum_coeffs is
    accepted for signature parity with the reference's SceneToDisplay
    LuminanceFn but unused, exactly like hlgOotfApprox's [[maybe_unused]]
    luminance argument."""
    from ..types import ColorTransfer
    del lum_coeffs
    if ColorTransfer(ct) == ColorTransfer.HLG:
        return hlg_ootf_approx(rgb)
    return rgb


# ---------------------------------------------------------------------------
# RGB gamut conversion matrices (gainmapmath.cpp:603-615; derivation per
# Khronos DataFormat 1.3 primary conversion).  Stored with the same rounded
# values the reference ships so converted pixels agree bit-for-bit in f32.

BT709_TO_P3 = np.array([[0.822462, 0.177537, 0.000001],
                        [0.033194, 0.966807, -0.000001],
                        [0.017083, 0.072398, 0.91052]], np.float32)
BT709_TO_BT2100 = np.array([[0.627404, 0.329282, 0.043314],
                            [0.069097, 0.919541, 0.011362],
                            [0.016392, 0.088013, 0.895595]], np.float32)
P3_TO_BT709 = np.array([[1.22494, -0.22494, 0.0],
                        [-0.042057, 1.042057, 0.0],
                        [-0.019638, -0.078636, 1.098274]], np.float32)
P3_TO_BT2100 = np.array([[0.753833, 0.198597, 0.04757],
                         [0.045744, 0.941777, 0.012479],
                         [-0.00121, 0.017601, 0.983608]], np.float32)
BT2100_TO_BT709 = np.array([[1.660491, -0.587641, -0.07285],
                            [-0.124551, 1.1329, -0.008349],
                            [-0.018151, -0.100579, 1.11873]], np.float32)
BT2100_TO_P3 = np.array([[1.343578, -0.282179, -0.061399],
                         [-0.065298, 1.075788, -0.01049],
                         [0.002822, -0.019598, 1.016777]], np.float32)

_IDENTITY3 = np.eye(3, dtype=np.float32)


def gamut_conversion_matrix(dst_cg, src_cg) -> np.ndarray:
    """getGamutConversionFn (gainmapmath.cpp:1087-1133) as a matrix lookup."""
    from ..types import ColorGamut
    dst, src = ColorGamut(dst_cg), ColorGamut(src_cg)
    if dst == src:
        return _IDENTITY3
    table = {
        (ColorGamut.DISPLAY_P3, ColorGamut.BT709): BT709_TO_P3,
        (ColorGamut.BT2100, ColorGamut.BT709): BT709_TO_BT2100,
        (ColorGamut.BT709, ColorGamut.DISPLAY_P3): P3_TO_BT709,
        (ColorGamut.BT2100, ColorGamut.DISPLAY_P3): P3_TO_BT2100,
        (ColorGamut.BT709, ColorGamut.BT2100): BT2100_TO_BT709,
        (ColorGamut.DISPLAY_P3, ColorGamut.BT2100): BT2100_TO_P3,
    }
    return table[(dst, src)]


def convert_gamut(rgb, matrix):
    return apply_3x3(matrix, rgb)


# ---------------------------------------------------------------------------
# YUV-space gamut ("encoding") conversion matrices (gainmapmath.cpp:638-674).

YUV_BT709_TO_BT601 = np.array([[1.0, 0.101579, 0.196076],
                               [0.0, 0.989854, -0.110653],
                               [0.0, -0.072453, 0.983398]], np.float32)
YUV_BT709_TO_BT2100 = np.array([[1.0, -0.016969, 0.096312],
                                [0.0, 0.995306, -0.051192],
                                [0.0, 0.011507, 1.002637]], np.float32)
YUV_BT601_TO_BT709 = np.array([[1.0, -0.118188, -0.212685],
                               [0.0, 1.018640, 0.114618],
                               [0.0, 0.075049, 1.025327]], np.float32)
YUV_BT601_TO_BT2100 = np.array([[1.0, -0.128245, -0.115879],
                                [0.0, 1.010016, 0.061592],
                                [0.0, 0.086969, 1.029350]], np.float32)
YUV_BT2100_TO_BT709 = np.array([[1.0, 0.018149, -0.095132],
                                [0.0, 1.004123, 0.051267],
                                [0.0, -0.011524, 0.996782]], np.float32)
YUV_BT2100_TO_BT601 = np.array([[1.0, 0.117887, 0.105521],
                                [0.0, 0.995211, -0.059549],
                                [0.0, -0.084085, 0.976518]], np.float32)


def yuv_encoding_conversion_matrix(src_cg, dst_cg):
    """JpegR::convertYuv coefficient table (jpegr.cpp:430-513).
    Returns None for identity. P3 uses BT.601 YUV encoding."""
    from ..types import ColorGamut
    src, dst = ColorGamut(src_cg), ColorGamut(dst_cg)
    if src == dst:
        return None
    table = {
        (ColorGamut.BT709, ColorGamut.DISPLAY_P3): YUV_BT709_TO_BT601,
        (ColorGamut.BT709, ColorGamut.BT2100): YUV_BT709_TO_BT2100,
        (ColorGamut.DISPLAY_P3, ColorGamut.BT709): YUV_BT601_TO_BT709,
        (ColorGamut.DISPLAY_P3, ColorGamut.BT2100): YUV_BT601_TO_BT2100,
        (ColorGamut.BT2100, ColorGamut.BT709): YUV_BT2100_TO_BT709,
        (ColorGamut.BT2100, ColorGamut.DISPLAY_P3): YUV_BT2100_TO_BT601,
    }
    return table[(src, dst)]


# ---------------------------------------------------------------------------
# Sanitizers / clamps (gainmapmath.h:548-593)

def clip_negatives(x):
    return jnp.maximum(x, 0.0)


def clamp_pixel_float(x):
    return jnp.clip(x, 0.0, 1.0)


def clamp_pixel_float_linear(x):
    return jnp.clip(x, 0.0, MAX_PIXEL_FLOAT_HDR_LINEAR)


def sanitize_pixel(x):
    """sanitizePixel (gainmapmath.h:585-590): nan->0, +inf->max, -inf->0,
    finite clamped to [0, 10000/203]."""
    x = jnp.asarray(x, jnp.float32)
    x = jnp.where(jnp.isnan(x), 0.0, x)
    x = jnp.where(jnp.isposinf(x), MAX_PIXEL_FLOAT_HDR_LINEAR, x)
    x = jnp.where(jnp.isneginf(x), 0.0, x)
    return jnp.clip(x, 0.0, MAX_PIXEL_FLOAT_HDR_LINEAR)
