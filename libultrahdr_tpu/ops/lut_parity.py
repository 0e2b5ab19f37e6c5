"""Reference-LUT numeric parity without lookup tables.

The reference routes hot-path transfer functions through lookup tables
(USE_*_LUT, /root/reference/lib/include/ultrahdr/gainmapmath.h:27-32) indexed
by round-half-up of x*(N-1) (gainmapmath.cpp:127-134 etc.).  A LUT lookup of a
monotone function f equals f(q(x)) where q snaps x to the LUT grid:

    lut[clip(floor(x*(N-1)+0.5), 0, N-1)] == f(clip(floor(x*(N-1)+0.5),0,N-1)/(N-1))

because entry i stores f(i/(N-1)) exactly (LookUpTable, gainmapmath.h:344-356).
So instead of a per-pixel gather (expensive on the TPU VPU) we do one
multiply/floor/clip (cheap, fully fused) and keep bit-comparable f32 results.

Set PARITY = False to skip quantization entirely (pure exact math — strictly
more accurate, marginally faster).
"""

from __future__ import annotations

import jax.numpy as jnp

# LUT sizes (gainmapmath.h:274-342, 449-450)
SRGB_INV_OETF_N = 1 << 10
HLG_OETF_N = 1 << 16
HLG_INV_OETF_N = 1 << 12
PQ_OETF_N = 1 << 16
PQ_INV_OETF_N = 1 << 12
GAIN_FACTOR_N = 1 << 10

PARITY = True


def lut_quantize(x, n: int):
    """Snap x in [0,1] to the reference's N-entry LUT grid (round-half-up,
    clamped), or pass through when PARITY is off."""
    if not PARITY:
        return x
    idx = jnp.clip(jnp.floor(x * (n - 1) + 0.5), 0.0, float(n - 1))
    return idx * (1.0 / (n - 1))
