"""Pallas apply-gainmap kernel vs the XLA path: bit-exact equivalence.

The analog of the reference's NEON-vs-scalar comparisons
(/root/reference/tests/gainmapmath_test.cpp:759,956) — same math, different
backend, identical outputs.  Runs the kernel in interpreter mode on the CPU
test backend."""

import numpy as np
import pytest
import jax.numpy as jnp

from libultrahdr_tpu.ops import apply as apply_ops
from libultrahdr_tpu.ops import pallas_apply
from libultrahdr_tpu.types import ColorGamut, ColorTransfer


def _inputs(h=64, w=128, seed=0):
    rs = np.random.RandomState(seed)
    sdr = rs.rand(3, h, w).astype(np.float32)
    sdr[1:] -= 0.5
    gain_u8 = rs.randint(0, 256, (3, h, w)).astype(np.uint8)
    meta = {"gamma": np.array([1.0, 1.0, 1.0], np.float32),
            "min_content_boost": np.array([1.0, 1.0, 1.0], np.float32),
            "max_content_boost": np.array([4.9, 4.9, 4.9], np.float32),
            "offset_sdr": np.full(3, 1e-7, np.float32),
            "offset_hdr": np.full(3, 1e-7, np.float32)}
    return sdr, gain_u8, meta


@pytest.mark.parametrize("out_ct", [ColorTransfer.HLG, ColorTransfer.PQ,
                                    ColorTransfer.LINEAR])
@pytest.mark.parametrize("use_base_cg", [True, False])
def test_pallas_matches_xla(out_ct, use_base_cg):
    sdr, gain_u8, meta = _inputs()
    want = np.asarray(apply_ops.apply_gainmap_core(
        jnp.asarray(sdr), jnp.asarray(gain_u8), meta, scale_k=1,
        weight=jnp.float32(0.8), out_ct=out_ct,
        sdr_cg=ColorGamut.DISPLAY_P3, hdr_cg=ColorGamut.BT2100,
        use_base_cg=use_base_cg))
    got = np.asarray(pallas_apply.apply_gainmap_pallas(
        jnp.asarray(sdr), jnp.asarray(gain_u8).astype(jnp.float32) / 255.0,
        pallas_apply.meta_to_rows(meta), 0.8, out_ct=out_ct,
        sdr_cg=ColorGamut.DISPLAY_P3, hdr_cg=ColorGamut.BT2100,
        use_base_cg=use_base_cg, interpret=True))
    np.testing.assert_array_equal(got, want)


def test_pallas_gamma_weight_and_padding():
    # non-multiple-of-tile dims exercise the pad/crop path; gamma != 1
    # exercises the pow branch
    sdr, gain_u8, meta = _inputs(h=50, w=70, seed=3)
    meta["gamma"][:] = 1.571
    want = np.asarray(apply_ops.apply_gainmap_core(
        jnp.asarray(sdr), jnp.asarray(gain_u8), meta, scale_k=1,
        weight=jnp.float32(0.31), out_ct=ColorTransfer.HLG,
        sdr_cg=ColorGamut.BT709, hdr_cg=ColorGamut.DISPLAY_P3,
        use_base_cg=True))
    got = np.asarray(pallas_apply.apply_gainmap_pallas(
        jnp.asarray(sdr), jnp.asarray(gain_u8).astype(jnp.float32) / 255.0,
        pallas_apply.meta_to_rows(meta), 0.31, out_ct=ColorTransfer.HLG,
        sdr_cg=ColorGamut.BT709, hdr_cg=ColorGamut.DISPLAY_P3,
        use_base_cg=True, interpret=True))
    np.testing.assert_array_equal(got, want)
