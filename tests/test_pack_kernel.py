"""Mosaic/Pallas entropy-pack kernel vs the XLA tree: bit-identity.

The kernel (jpeg/pack_kernel.py) replaces device_entropy._block_buffers'
HBM-materialized combine tree with a VMEM-resident one; its block buffers,
bit lengths, compacted words and final joined scans must be bit-identical
whichever stage-2 engine ran (the NEON-vs-scalar equivalence discipline of
the reference, tests/gainmapmath_test.cpp:759)."""

import numpy as np
import pytest

import jax.numpy as jnp

from libultrahdr_tpu.jpeg import device_entropy as de
from libultrahdr_tpu.jpeg import native, pack_kernel as pk


def _planes(layout, seed=0, dense=False):
    rs = np.random.RandomState(seed)
    out = []
    for hs, vs in layout.sampling:
        bh, bw = layout.mcus_h * vs, layout.mcus_w * hs
        c = np.zeros((bh, bw, 64), np.int16)
        c[..., 0] = rs.randint(-300, 300, (bh, bw))
        n_ac = 40 if dense else 20
        nz = rs.rand(bh, bw, n_ac) < (0.6 if dense else 0.3)
        c[..., 1:1 + n_ac] = np.where(
            nz, rs.randint(-200, 200, (bh, bw, n_ac)), 0)
        out.append(jnp.asarray(c))
    return out


@pytest.mark.parametrize("sampling,mw,mh,dense", [
    (((2, 2), (1, 1), (1, 1)), 8, 6, False),
    (((1, 1),), 16, 16, True),
    (((1, 1), (1, 1), (1, 1)), 5, 7, False),
])
def test_kernel_stage2_bit_identical_to_xla(sampling, mw, mh, dense):
    """block_buffers_kernel replays the XLA combine tree exactly (same
    padded slot inputs -> identical block buffers, lengths and compacted
    words)."""
    layout = de.scan_layout(sampling, mw, mh)
    planes = _planes(layout, seed=mw, dense=dense)
    # XLA tree (reference engine)
    bb, blen_ref = de._block_buffers(planes, layout)
    n_blocks = layout.mcus_h * layout.bpr
    w_out = n_blocks * de._default_budget(n_blocks)
    w_ref = de._compact_blocks(bb, blen_ref, w_out)
    # Pallas stage-2 kernel (interpret mode on CPU)
    bb_t, blen_ker = pk.block_buffers_kernel(planes, layout, interpret=True)
    np.testing.assert_array_equal(np.asarray(blen_ref),
                                  np.asarray(blen_ker))
    w_ker = pk.compact_blocks_t(bb_t, blen_ker, w_out)
    need = de.total_words_v2(np.asarray(blen_ref))
    np.testing.assert_array_equal(np.asarray(w_ref)[:need],
                                  np.asarray(w_ker)[:need])


@pytest.mark.parametrize("sampling,mw,mh,dense", [
    (((2, 2), (1, 1), (1, 1)), 8, 6, False),
    (((1, 1),), 16, 16, True),
    (((1, 1), (1, 1), (1, 1)), 5, 7, False),
])
def test_v3_kernel_scan_byte_identical(sampling, mw, mh, dense):
    """The fused v3 kernel (symbols + pack + compact in one Pallas call)
    emits rows UNPADDED; the host joiner byte-aligns them, producing scans
    byte-identical to the pre-padded XLA engine."""
    layout = de.scan_layout(sampling, mw, mh)
    planes = _planes(layout, seed=100 + mw, dense=dense)
    # XLA engine scan
    bb, blen_ref = de._block_buffers(planes, layout)
    n_blocks = layout.mcus_h * layout.bpr
    w_ref = de._compact_blocks(bb, blen_ref,
                               n_blocks * de._default_budget(n_blocks))
    need_ref = de.total_words_v2(np.asarray(blen_ref))
    scan_ref = native.join_blocks(np.asarray(w_ref)[:need_ref],
                                  np.asarray(blen_ref, np.uint16),
                                  layout.bpr)
    # v3 kernel scan (interpret mode on CPU)
    w_ker, blen_ker = pk.pack_scan_device_kernel(planes, layout,
                                                 interpret=True)
    # v3 lens differ from padded lens only in each row's last block
    bl_r = np.asarray(blen_ref).reshape(mh, layout.bpr)
    bl_k = np.asarray(blen_ker).reshape(mh, layout.bpr)
    np.testing.assert_array_equal(bl_r[:, :-1], bl_k[:, :-1])
    row_bits = bl_k.sum(axis=1)
    np.testing.assert_array_equal(bl_r[:, -1] - bl_k[:, -1],
                                  (-row_bits) % 8)
    need_ker = de.total_words_v2(np.asarray(blen_ker))
    scan_ker = native.join_blocks(np.asarray(w_ker)[:need_ker],
                                  np.asarray(blen_ker, np.uint16),
                                  layout.bpr)
    assert scan_ker == scan_ref


def test_transposed_compact_scans_matches_legacy():
    """compact_scans in the transposed convention produces the same
    back-to-back word stream as the legacy row-major _compact_blocks."""
    l1 = de.scan_layout(((2, 2), (1, 1), (1, 1)), 6, 4)
    l2 = de.scan_layout(((1, 1),), 6, 4)
    p1, p2 = _planes(l1, 3), _planes(l2, 4)
    bb1, bl1 = de._block_buffers(p1, l1)
    bb2, bl2 = de._block_buffers(p2, l2)
    w_legacy = de._compact_blocks(
        jnp.concatenate([bb1, bb2], axis=0),
        jnp.concatenate([bl1, bl2]),
        bb1.shape[0] * de._default_budget(bb1.shape[0])
        + bb2.shape[0] * de._default_budget(bb2.shape[0]))
    w_t, blens = de.compact_scans([de.block_buffers_t(p1, l1),
                                   de.block_buffers_t(p2, l2)])
    need = de.total_words_v2(np.concatenate([np.asarray(bl1),
                                             np.asarray(bl2)]))
    np.testing.assert_array_equal(np.asarray(w_legacy)[:need],
                                  np.asarray(w_t)[:need])


def test_env_kill_switch(monkeypatch):
    monkeypatch.setenv("UHDR_TPU_PACK_KERNEL", "0")
    assert de.use_pack_kernel() is False


def test_kernel_multi_scan_stitch_matches_legacy():
    """Kernel-engine compact_scans (per-tile v3 compaction + stitched
    dynamic_update_slices) lays scans back-to-back; each scan's live
    prefix, host-joined, must match the legacy engine's scan bytes."""
    l1 = de.scan_layout(((2, 2), (1, 1), (1, 1)), 6, 4)
    l2 = de.scan_layout(((1, 1),), 6, 4)
    p1, p2 = _planes(l1, 7), _planes(l2, 8)
    t1 = pk.pack_scan_tiles(p1, l1, interpret=True)
    t2 = pk.pack_scan_tiles(p2, l2, interpret=True)
    w_t, blens = de.compact_scans([t1, t2])
    w_t = np.asarray(w_t)

    off = 0
    for (planes, layout), blen in zip([(p1, l1), (p2, l2)], blens):
        bb, bl_ref = de._block_buffers(planes, layout)
        n = layout.mcus_h * layout.bpr
        w_ref = de._compact_blocks(bb, bl_ref, n * de._default_budget(n))
        need_ref = de.total_words_v2(np.asarray(bl_ref))
        scan_ref = native.join_blocks(np.asarray(w_ref)[:need_ref],
                                      np.asarray(bl_ref, np.uint16),
                                      layout.bpr)
        need = de.total_words_v2(np.asarray(blen))
        scan_ker = native.join_blocks(w_t[off:off + need],
                                      np.asarray(blen), layout.bpr)
        assert scan_ker == scan_ref
        off += need


def test_tile_budget_check():
    blen = np.full(3000, 40, np.int32)       # 2 words each, fits
    pk.check_tile_budgets(blen, budget=16)
    blen_bad = np.full(pk._TILE, 54 * 32, np.int32)  # 54 words/block
    with pytest.raises(de.PackOverflowError):
        pk.check_tile_budgets(blen_bad, budget=16)
