"""Mosaic (Pallas) entropy-pack kernel: slot symbols -> per-block word
buffers entirely in VMEM.

The XLA v2 packer (device_entropy._block_buffers) materializes every
intermediate of the 72-slot combine tree in HBM — the dominant cost of the
~95 ms 4K entropy pack is that HBM traffic, not compute.  This kernel keeps
the whole tree in VMEM: blocks ride the 128 lanes (one lane = one JPEG
block), slots unroll as 72 sequential VPU steps, and only the inputs
(slot payload/length) and outputs (54-word block buffers + bit lengths)
touch HBM.

Bit-exactness: the kernel replays device_entropy's exact combine tree
(_msb2 / _append2 / _append_words / _shift_down in identical order), so its
block buffers equal the XLA path's bit for bit (tests/test_pack_kernel.py),
and the final scan is byte-identical whichever stage-2 engine ran.

Reference role being replaced: the libjpeg entropy coder the reference
calls from JpegEncoderHelper::encode
(/root/reference/lib/src/jpegencoderhelper.cpp:131-244).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from . import device_entropy as de

_SLOTS = de._GROUPS_PER_BLOCK * 8          # 72 (66 real + zero pad)
_CAP = de._BLOCK_CAP_WORDS                 # 54
_TILE = 2048                               # blocks per kernel instance

# the unrolled combine tree keeps many (_, _TILE) vectors live; the default
# 16 MB scoped-VMEM budget falls ~0.4 MB short at _TILE=2048 (v5e has
# 128 MB physical VMEM, so raising the scoped limit is free headroom)
_COMPILER_PARAMS = pltpu.CompilerParams(vmem_limit_bytes=64 * 1024 * 1024)


def _combine8_list(gp, gl):
    """device_entropy._combine8 on a python list of 8 lane-vectors
    (identical op order -> identical bits)."""
    p2, l2 = [], []
    for i in range(4):
        s0 = de._msb2(gp[2 * i], gl[2 * i])
        a0, a1, alen = de._append2(s0[0], s0[1], gl[2 * i],
                                   gp[2 * i + 1], gl[2 * i + 1])
        p2.append([a0, a1])
        l2.append(alen)
    q0, ql0 = de._append_words(p2[0], l2[0], p2[1], l2[1], 4, 1)
    q1, ql1 = de._append_words(p2[2], l2[2], p2[3], l2[3], 4, 1)
    return de._append_words(q0, ql0, q1, ql1, 7, 3)


def _group_offsets(lens):
    """Exclusive prefix of the 72 slot lengths sampled at group starts:
    returns ([off at slot 8g for g in 0..8], total) — the slot axis is the
    sublane dim, so a 72-step unrolled add replaces cumsum (which Mosaic
    does not lower)."""
    goffs = []
    acc = jnp.zeros_like(lens[0])
    for s in range(_SLOTS):
        if s % 8 == 0:
            goffs.append(acc)
        acc = acc + lens[s]
    return goffs, acc


def _prefix_sum_lanes(x):
    """Inclusive prefix sum along the lane axis of a (1, T) i32 array
    (Hillis-Steele over pltpu.roll; Mosaic has no cumsum lowering)."""
    n = x.shape[1]
    ids = jax.lax.broadcasted_iota(jnp.int32, x.shape, 1)
    sh = 1
    while sh < n:
        r = pltpu.roll(x, sh, axis=1)
        x = x + jnp.where(ids >= sh, r, 0)
        sh *= 2
    return x


def _pack_tile_kernel(pays_ref, lens_ref, bb_ref, blen_ref):
    """One tile: (72, T) slot payloads/lengths -> (54, T) block buffers +
    (1, T) bit lengths.  Lanes are blocks."""
    pays = pays_ref[:]                       # (72, T) u32
    lens = lens_ref[:]                       # (72, T) i32

    goffs, blen = _group_offsets(lens)
    blen_ref[:] = blen[None, :]

    t = pays.shape[1]
    row_ids = jax.lax.broadcasted_iota(jnp.int32, (_CAP, t), 0)
    bb = jnp.zeros((_CAP, t), jnp.uint32)
    for g in range(de._GROUPS_PER_BLOCK):
        gp = [pays[8 * g + i] for i in range(8)]
        gl = [lens[8 * g + i] for i in range(8)]
        seg, _ = _combine8_list(gp, gl)      # 7 lane-vectors
        goff = goffs[g]                      # (T,) group bit offset
        placed = de._shift_down(seg, (goff & 31).astype(jnp.uint32))
        gw = (goff >> 5)[None, :]            # (1, T) word offset
        for d in range(8):
            bb = bb | jnp.where(row_ids == gw + d, placed[d][None, :], 0)
    bb_ref[:] = bb


@functools.partial(jax.jit, static_argnames=("interpret",))
def pack_blocks_pallas(pays, lens, *, interpret: bool = False):
    """(n_blocks, 72) slot payloads/lengths -> (54, n_blocks) TRANSPOSED
    block buffers + (n_blocks,) bit lengths (blocks-in-lanes layout, tile
    padding sliced off so lane index == global block index; compact with
    compact_blocks_t)."""
    n_blocks = pays.shape[0]
    n_pad = -(-n_blocks // _TILE) * _TILE
    pays_t = jnp.pad(pays, ((0, n_pad - n_blocks), (0, 0))).T
    lens_t = jnp.pad(lens, ((0, n_pad - n_blocks), (0, 0))).T

    bb_t, blen = pl.pallas_call(
        _pack_tile_kernel,
        grid=(n_pad // _TILE,),
        in_specs=[
            pl.BlockSpec((_SLOTS, _TILE), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((_SLOTS, _TILE), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((_CAP, _TILE), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, _TILE), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((_CAP, n_pad), jnp.uint32),
            jax.ShapeDtypeStruct((1, n_pad), jnp.int32),
        ],
        interpret=interpret,
        compiler_params=_COMPILER_PARAMS,
    )(pays_t, lens_t)
    return bb_t[:, :n_blocks], blen[0, :n_blocks]


def compact_blocks_t(bb_t, blen, w_out: int):
    """device_entropy._compact_blocks for the transposed (54, n_pad)
    buffer layout: word (blk, src) lives at bb_t[src, blk]."""
    n_pad = bb_t.shape[1]
    n_blocks = blen.shape[0]
    wlen = (blen + 31) >> 5
    dest = jnp.cumsum(wlen) - wlen
    mark = jnp.zeros((w_out,), jnp.int32).at[dest].max(
        jnp.arange(n_blocks, dtype=jnp.int32), mode="drop",
        indices_are_sorted=True)
    blk = jax.lax.associative_scan(jnp.maximum, mark)
    src = jnp.arange(w_out, dtype=jnp.int32) - jnp.take(dest, blk)
    flat_idx = jnp.clip(src, 0, _CAP - 1) * n_pad + blk
    return jnp.take(bb_t.reshape(-1), flat_idx)


# ---------------------------------------------------------------------------
# fused tile compaction: the XLA inverse-map compaction costs ~80 ms/4K
# (scatter-max 35 + cummax 35 + element gather 99 standalone; the three are
# each O(w_out=3.1M) with TPU-hostile lowerings).  Instead each kernel tile
# compacts its own 2048 blocks in VMEM — the word->block inverse map becomes
# chunked MXU one-hot contractions over the tile — and tiles stitch with a
# chain of dynamic_update_slices whose later garbage tails overwrite earlier
# ones in grid order, leaving every live prefix intact.

_CHUNK = 256                      # output words compacted per MXU step


def _pack_compact_tile_kernel(pays_ref, lens_ref, out_ref, blen_ref):
    """One tile: (72, T) slots -> (8, B/8) per-tile COMPACTED words (the
    tile's B-word budget viewed as 8 rows for Mosaic's sublane tiling) +
    (1, T) block bit lengths."""
    pays = pays_ref[:]
    lens = lens_ref[:]
    t = pays.shape[1]
    budget = out_ref.shape[0] * out_ref.shape[1]
    row_w = out_ref.shape[1]

    goffs, blen = _group_offsets(lens)
    blen_ref[:] = blen[None, :]

    row_ids = jax.lax.broadcasted_iota(jnp.int32, (_CAP, t), 0)
    bb = jnp.zeros((_CAP, t), jnp.uint32)
    for g in range(de._GROUPS_PER_BLOCK):
        gp = [pays[8 * g + i] for i in range(8)]
        gl = [lens[8 * g + i] for i in range(8)]
        seg, _ = _combine8_list(gp, gl)
        goff = goffs[g]
        placed = de._shift_down(seg, (goff & 31).astype(jnp.uint32))
        gw = (goff >> 5)[None, :]
        for d in range(8):
            bb = bb | jnp.where(row_ids == gw + d, placed[d][None, :], 0)

    # ---- in-tile compaction -------------------------------------------
    wlen = (blen + 31) >> 5                                 # (T,)
    incl = _prefix_sum_lanes(wlen[None, :])[0]              # inclusive
    dest = incl - wlen                                      # (T,) word dest
    live = jnp.sum(wlen, dtype=jnp.int32)                   # scalar reduce
    # byte planes: the MXU's default (and fastest) pass truncates inputs to
    # bf16 whose 8-bit mantissa only holds integers <= 256 exactly, so the
    # one-hot gathers contract BYTES — with a one-hot lhs exactly one term
    # is nonzero, making each product and the f32 accumulation exact
    bb_bytes = [((bb >> (8 * k)) & jnp.uint32(0xFF)).astype(jnp.int32)
                .astype(jnp.float32) for k in range(4)]     # 4 x (54, T)
    dest_bytes = [((dest >> (8 * k)) & 0xFF).astype(jnp.float32)[None, :]
                  for k in range(3)]                        # 3 x (1, T)
    src_rows = jax.lax.broadcasted_iota(jnp.int32, (_CHUNK, _CAP), 1)
    dnum = (((1,), (1,)), ((), ()))

    n_chunks = budget // _CHUNK
    for c in range(n_chunks):
        @pl.when(c * _CHUNK < live)
        def _(c=c):
            j = (jax.lax.broadcasted_iota(jnp.int32, (_CHUNK, 1), 0)
                 + c * _CHUNK)                              # (C, 1)
            ge = (j >= dest[None, :]).astype(jnp.float32)   # (C, T)
            blk = jnp.sum(ge, axis=1).astype(jnp.int32) - 1  # (C,)
            onehot = (blk[:, None] == jax.lax.broadcasted_iota(
                jnp.int32, (_CHUNK, t), 1)).astype(jnp.float32)
            dst_of = jnp.zeros((_CHUNK,), jnp.int32)
            for k, db in enumerate(dest_bytes):
                part = jax.lax.dot_general(
                    onehot, db, dnum,
                    preferred_element_type=jnp.float32)[:, 0]
                dst_of = dst_of + (part.astype(jnp.int32) << (8 * k))
            src = j[:, 0] - dst_of                          # (C,)
            word_i = jnp.zeros((_CHUNK,), jnp.int32)
            for k, bbb in enumerate(bb_bytes):
                part = jax.lax.dot_general(
                    onehot, bbb, dnum,
                    preferred_element_type=jnp.float32)     # (C, 54)
                # exactly one src row matches per word: i32 sum == select
                byte = jnp.sum(
                    jnp.where(src[:, None] == src_rows,
                              part.astype(jnp.int32), 0),
                    axis=1, dtype=jnp.int32)
                word_i = word_i | (byte << (8 * k))
            out_ref[(c * _CHUNK) // row_w,
                    pl.ds((c * _CHUNK) % row_w, _CHUNK)] = \
                jax.lax.bitcast_convert_type(word_i, jnp.uint32)


@functools.partial(jax.jit, static_argnames=("budget", "interpret"))
def pack_tiles_pallas(pays, lens, *, budget: int, interpret: bool = False):
    """(n_blocks, 72) slots -> (n_tiles, tile_budget) per-tile compacted
    words + (n_blocks,) bit lengths.  tile_budget = _TILE * budget."""
    n_blocks = pays.shape[0]
    n_pad = -(-n_blocks // _TILE) * _TILE
    pays_t = jnp.pad(pays, ((0, n_pad - n_blocks), (0, 0))).T
    lens_t = jnp.pad(lens, ((0, n_pad - n_blocks), (0, 0))).T
    n_tiles = n_pad // _TILE
    tile_budget = _TILE * budget
    row_w = tile_budget // 8          # budget viewed as (8, row_w) rows

    tiles, blen = pl.pallas_call(
        _pack_compact_tile_kernel,
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec((_SLOTS, _TILE), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((_SLOTS, _TILE), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((8, row_w), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, _TILE), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((n_tiles * 8, row_w), jnp.uint32),
            jax.ShapeDtypeStruct((1, n_pad), jnp.int32),
        ],
        interpret=interpret,
        compiler_params=_COMPILER_PARAMS,
    )(pays_t, lens_t)
    return tiles.reshape(n_tiles, tile_budget), blen[0, :n_blocks]


def tile_live_words(blen, n_blocks: int):
    """(n_tiles,) live word counts per kernel tile, from block bit
    lengths (device-side; also the host-side overflow check input)."""
    wlen = (blen + 31) >> 5
    n_pad = -(-n_blocks // _TILE) * _TILE
    wlen = jnp.pad(wlen, (0, n_pad - n_blocks))
    return jnp.sum(wlen.reshape(-1, _TILE), axis=1, dtype=jnp.int32)


def stitch_tiles(parts):
    """Chain per-tile (or per-scan) compacted buffers into ONE contiguous
    stream: parts = [(tiles (n_tiles, B), live (n_tiles,)), ...].  Each
    dynamic_update_slice writes a full budget block at its stream offset;
    grid/loop order guarantees later writes only clobber earlier GARBAGE
    tails, so every live prefix survives (same invariant as the inverse
    map, without its scatter/cummax/gather)."""
    total_budget = sum(int(t.shape[0] * t.shape[1]) for t, _ in parts)
    buf = jnp.zeros((total_budget,), jnp.uint32)
    off = jnp.int32(0)
    for tiles, live in parts:
        goff = off + jnp.cumsum(live) - live
        n_tiles = tiles.shape[0]

        def body(i, b, tiles=tiles, goff=goff):
            return jax.lax.dynamic_update_slice(b, tiles[i], (goff[i],))
        buf = jax.lax.fori_loop(0, n_tiles, body, buf)
        off = off + jnp.sum(live)
    return buf


def check_tile_budgets(blen: np.ndarray, budget: int):
    """Host-side: every kernel tile must fit its word budget (the kernel
    drops the tail of an overflowing tile, like the global budget drop)."""
    wlen = (np.asarray(blen).astype(np.int64) + 31) >> 5
    n_pad = -(-wlen.size // _TILE) * _TILE
    wlen = np.pad(wlen, (0, n_pad - wlen.size))
    per_tile = wlen.reshape(-1, _TILE).sum(axis=1)
    limit = _TILE * budget
    if (per_tile > limit).any():
        raise de.PackOverflowError(
            f"tile needs {int(per_tile.max())} words > tile budget {limit}")


def _slots_for_kernel(coeff_planes, layout: de.ScanLayout):
    """device_entropy._block_buffers' preprocessing: slot symbols + the
    per-row byte-align pad folded into each row's last block, padded to
    72 slots — shaped (n_blocks, 72)."""
    n_rows, bpr = layout.mcus_h, layout.bpr
    n_blocks = n_rows * bpr
    pays, lens = de._slot_symbols(coeff_planes, layout)

    row_bits = jnp.sum(lens, axis=(1, 2), dtype=jnp.int32)
    pad_len = (-row_bits) % 8
    pad_pay = (jnp.uint32(1) << pad_len.astype(jnp.uint32)) - 1
    last = jnp.zeros((bpr,), bool).at[bpr - 1].set(True)
    slot_pad_pay = jnp.where(last[None, :], pad_pay[:, None], 0) \
        .astype(jnp.uint32)
    slot_pad_len = jnp.where(last[None, :], pad_len[:, None], 0)
    pays = jnp.concatenate([pays, slot_pad_pay[..., None]], axis=-1)
    lens = jnp.concatenate([lens, slot_pad_len[..., None]], axis=-1)

    pays = pays.reshape(n_blocks, 66)
    lens = lens.reshape(n_blocks, 66)
    zpad = _SLOTS - 66
    return (jnp.pad(pays, ((0, 0), (0, zpad))),
            jnp.pad(lens, ((0, 0), (0, zpad))))


# ---------------------------------------------------------------------------
# v3: symbol generation INSIDE the kernel.  The XLA slot-symbol stage costs
# ~40 ms at 4K (12M-element pipelines with HBM-materialized intermediates);
# in-kernel, the per-coefficient work (categories, runs, Huffman LUTs,
# value bits) is pure VPU over VMEM-resident (63, T) arrays.  Device blocks
# carry NO row padding — the host joiner byte-aligns each restart row
# itself (uhdr_join_blocks), emitting the same final bytes either way.

@functools.lru_cache(maxsize=2)
def _packed_dc_lut(chroma: bool):
    """(12,) u32 DC table, code*32+len, indexed by size category."""
    from .tables import DC_CHROMA, DC_LUMA
    t = DC_CHROMA if chroma else DC_LUMA
    return (np.asarray(t.code_of[:12], np.uint32) * 32
            + np.asarray(t.size_of[:12], np.uint32))


@functools.lru_cache(maxsize=1)
def _ac_special():
    """(zrl_luma, zrl_chroma, eob_luma, eob_chroma) packed code*32+len."""
    lut_l, lut_c = de._packed_ac_lut(False), de._packed_ac_lut(True)
    return (int(lut_l[0xF0]), int(lut_c[0xF0]),
            int(lut_l[0x00]), int(lut_c[0x00]))


def _bit_size_vec(v):
    """JPEG magnitude category via compares (Mosaic has no clz)."""
    a = jnp.abs(v)
    s = jnp.zeros_like(v)
    for m in range(15):
        s = s + (a > ((1 << m) - 1)).astype(jnp.int32)
    return s


def _lut_pair(sym, luma_b, tbl_l, tbl_c):
    """Per-lane dual-table lookup as a live-entry select-sum."""
    acc = jnp.zeros(sym.shape, jnp.uint32)
    for s in range(len(tbl_l)):
        vl, vc = int(tbl_l[s]), int(tbl_c[s])
        if vl == 0 and vc == 0:
            continue
        val = jnp.where(luma_b, jnp.uint32(vl), jnp.uint32(vc))
        acc = acc | jnp.where(sym == s, val, jnp.uint32(0))
    return acc


def _slot_lists_in_kernel(coeffs, dc_diff, luma_b):
    """(64, R, L) stream coefficients + (R, L) DC diffs + (R, L) is-luma
    -> per-slot (pays, lens) python lists of 72 (R, L) arrays, replaying
    the XLA _slot_symbols math (device_entropy.py) op for op.

    Blocks are laid out (R=8 sublanes, L=256 lanes), block index
    b = r*L + l, so every per-block vector op fills the full 8x128 VPU
    (a (T,) lane-vector would occupy 1 sublane = 1/8 of each vreg)."""
    r, l = dc_diff.shape
    lut_l, lut_c = de._packed_ac_lut(False), de._packed_ac_lut(True)
    zl, zc, el, ec = _ac_special()

    # ---- DC slot ------------------------------------------------------
    dsize = _bit_size_vec(dc_diff)
    dv = _lut_pair(dsize, luma_b, _packed_dc_lut(False),
                   _packed_dc_lut(True))
    dcode, dclen = dv >> 5, (dv & 31).astype(jnp.int32)
    dbits = de._value_bits(dc_diff, dsize)
    dc_pay = (dcode << dsize.astype(jnp.uint32)) | dbits
    dc_len = dclen + dsize

    # ---- AC slots -----------------------------------------------------
    ac = coeffs[1:64]                       # (63, R, L)
    nz = ac != 0
    prevs = []
    acc = jnp.zeros((r, l), jnp.int32)
    for s in range(63):
        prevs.append(acc)
        acc = jnp.maximum(acc, jnp.where(nz[s], s + 1, 0))
    prev_nz = jnp.stack(prevs)              # (63, R, L) excl prefix max
    last_nz = acc[None]                     # (1, R, L)
    k = jax.lax.broadcasted_iota(jnp.int32, (63, r, l), 0) + 1
    d = k - prev_nz
    zrl_on = (~nz) & (d % 16 == 0) & (k < last_nz)
    run = (k - prev_nz - 1) % 16
    asize = _bit_size_vec(ac)
    sym = jnp.where(nz, (run << 4) | asize, 0)
    v = _lut_pair(sym, luma_b[None], lut_l, lut_c)
    acode, aclen = v >> 5, (v & 31).astype(jnp.int32)
    abits = de._value_bits(ac, asize)
    zrl_pay = jnp.where(luma_b, jnp.uint32(zl >> 5), jnp.uint32(zc >> 5))
    zrl_len = jnp.where(luma_b, zl & 31, zc & 31)
    ac_pay = jnp.where(nz, (acode << asize.astype(jnp.uint32)) | abits,
                       jnp.where(zrl_on, zrl_pay[None], 0))
    ac_len = jnp.where(nz, aclen + asize,
                       jnp.where(zrl_on, zrl_len[None], 0))

    eob_on = (last_nz < 63)[0]
    eob_pay = jnp.where(eob_on & luma_b, jnp.uint32(el >> 5),
                        jnp.where(eob_on, jnp.uint32(ec >> 5), 0))
    eob_len = jnp.where(eob_on & luma_b, el & 31,
                        jnp.where(eob_on, ec & 31, 0))

    zero_u = jnp.zeros((r, l), jnp.uint32)
    zero_i = jnp.zeros((r, l), jnp.int32)
    pays = [dc_pay] + [ac_pay[s] for s in range(63)] + [eob_pay] \
        + [zero_u] * (_SLOTS - 65)
    lens = [dc_len] + [ac_len[s] for s in range(63)] + [eob_len] \
        + [zero_i] * (_SLOTS - 65)
    return pays, lens


_R = 8                              # sublane rows per tile
_L = _TILE // _R                    # lanes per tile row (block b = r*_L + l)


def _sym_pack_tile_kernel(coeffs_ref, dcdiff_ref, luma_ref, out_ref,
                          blen_ref):
    """v3 tile: (64, R, L) stream coefficients -> (8, B/8) compacted words
    + (R, L) bit lengths (no row pad; the host joiner aligns rows)."""
    coeffs = coeffs_ref[:].astype(jnp.int32)
    dc_diff = dcdiff_ref[:].astype(jnp.int32)         # (R, L)
    luma_b = luma_ref[:] != 0                         # (R, L)
    t = _R * _L
    budget = out_ref.shape[0] * out_ref.shape[1]

    pays, lens = _slot_lists_in_kernel(coeffs, dc_diff, luma_b)

    # group offsets + total (exclusive prefix over the 72 slot lens)
    goffs = []
    acc = jnp.zeros((_R, _L), jnp.int32)
    for s in range(_SLOTS):
        if s % 8 == 0:
            goffs.append(acc)
        acc = acc + lens[s]
    blen = acc
    blen_ref[:] = blen

    row_ids = jax.lax.broadcasted_iota(jnp.int32, (_CAP, _R, _L), 0)
    bb = jnp.zeros((_CAP, _R, _L), jnp.uint32)
    for g in range(de._GROUPS_PER_BLOCK):
        gp = [pays[8 * g + i] for i in range(8)]
        gl = [lens[8 * g + i] for i in range(8)]
        seg, _ = _combine8_list(gp, gl)
        goff = goffs[g]
        placed = de._shift_down(seg, (goff & 31).astype(jnp.uint32))
        gw = (goff >> 5)[None]                        # (1, R, L)
        for dd in range(8):
            bb = bb | jnp.where(row_ids == gw + dd, placed[dd][None], 0)

    # ---- in-tile compaction -------------------------------------------
    # block order is b = r*L + l: per-row lane prefix + exclusive row
    # offsets give each block's word destination in the flat tile stream
    wlen = (blen + 31) >> 5                           # (R, L)
    incl = _prefix_sum_lanes(wlen)                    # per-row inclusive
    rowsum = jnp.sum(wlen, axis=1, keepdims=True)     # (R, 1)
    rs_t = rowsum.reshape(1, _R)
    ii = jax.lax.broadcasted_iota(jnp.int32, (_R, _R), 0)
    jj = jax.lax.broadcasted_iota(jnp.int32, (_R, _R), 1)
    rowoff = jnp.sum(jnp.where(jj < ii, jnp.broadcast_to(rs_t, (_R, _R)),
                               0), axis=1, keepdims=True)       # (R, 1)
    dest = (incl - wlen) + rowoff                     # (R, L) flat dests
    live = jnp.sum(wlen, dtype=jnp.int32)

    dest_f = dest.reshape(1, t)
    bb_f = bb.reshape(_CAP, t)
    bb_bytes = [((bb_f >> (8 * kk)) & jnp.uint32(0xFF)).astype(jnp.int32)
                .astype(jnp.float32) for kk in range(4)]
    dest_bytes = [((dest_f >> (8 * kk)) & 0xFF).astype(jnp.float32)
                  for kk in range(3)]
    src_rows = jax.lax.broadcasted_iota(jnp.int32, (_CHUNK, _CAP), 1)
    dnum = (((1,), (1,)), ((), ()))
    # only ~live/_CHUNK chunks hold data (~2-5% of the budget on typical
    # content); a dynamic-bound fori_loop touches just those, where an
    # unrolled budget//_CHUNK chain of pl.when regions pays its scalar
    # control-flow cost ~128 times per grid step.  out_ref is (n_chunks,
    # _CHUNK): one sublane row per chunk, so the store index is simply c.
    n_active = (live + _CHUNK - 1) // _CHUNK

    def chunk_body(c, carry):
        j = (jax.lax.broadcasted_iota(jnp.int32, (_CHUNK, 1), 0)
             + c * _CHUNK)
        ge = (j >= dest_f).astype(jnp.float32)
        blk = jnp.sum(ge, axis=1).astype(jnp.int32) - 1
        onehot = (blk[:, None] == jax.lax.broadcasted_iota(
            jnp.int32, (_CHUNK, t), 1)).astype(jnp.float32)
        dst_of = jnp.zeros((_CHUNK,), jnp.int32)
        for kk, db in enumerate(dest_bytes):
            part = jax.lax.dot_general(
                onehot, db, dnum,
                preferred_element_type=jnp.float32)[:, 0]
            dst_of = dst_of + (part.astype(jnp.int32) << (8 * kk))
        src = j[:, 0] - dst_of
        word_i = jnp.zeros((_CHUNK,), jnp.int32)
        for kk, bbb in enumerate(bb_bytes):
            part = jax.lax.dot_general(
                onehot, bbb, dnum,
                preferred_element_type=jnp.float32)
            byte = jnp.sum(
                jnp.where(src[:, None] == src_rows,
                          part.astype(jnp.int32), 0),
                axis=1, dtype=jnp.int32)
            word_i = word_i | (byte << (8 * kk))
        out_ref[pl.ds(c, 1), :] = \
            jax.lax.bitcast_convert_type(word_i, jnp.uint32)[None]
        return carry

    jax.lax.fori_loop(0, n_active, chunk_body, 0)


def _stream_inputs(coeff_planes, layout: de.ScanLayout):
    """XLA preprocessing for the v3 kernel: MCU-interleave the coefficient
    blocks to stream order and compute the per-row-reset DC diffs
    (T.81 F.1.2; restart rows reset the predictor).  Stream stays int16
    (half the HBM traffic; the kernel widens in VMEM)."""
    mh, mw = layout.mcus_h, layout.mcus_w
    stream = de._interleave_stream(
        [p.astype(jnp.int16) for p in coeff_planes], layout)
    comp_diffs = []
    for p, (hs, vs) in zip(coeff_planes, layout.sampling):
        dcs = p[..., 0].astype(jnp.int32).reshape(mh, vs, mw, hs)
        dcs = jnp.moveaxis(dcs, 1, 2).reshape(mh, mw * vs * hs)
        prev = jnp.concatenate([jnp.zeros_like(dcs[:, :1]), dcs[:, :-1]],
                               axis=1)
        comp_diffs.append((dcs - prev).reshape(mh, mw, vs * hs))
    dc_diff = jnp.concatenate(comp_diffs, axis=2).reshape(-1)
    is_luma = np.tile(layout.is_luma.astype(np.int32), mh)
    return stream.reshape(-1, 64), dc_diff, is_luma


@functools.partial(jax.jit, static_argnames=("budget", "interpret"))
def _pack_tiles_v3(stream, dc_diff, is_luma, *, budget: int,
                   interpret: bool = False):
    n_blocks = stream.shape[0]
    n_pad = -(-n_blocks // _TILE) * _TILE
    pad = n_pad - n_blocks
    n_tiles = n_pad // _TILE
    # blocked layout: block b of tile i sits at [:, i*R + b//L, b%L]
    stream_t = jnp.pad(stream, ((0, pad), (0, 0))) \
        .reshape(n_tiles, _R, _L, 64).transpose(3, 0, 1, 2) \
        .reshape(64, n_tiles * _R, _L)
    dcd = jnp.pad(dc_diff, (0, pad)).reshape(n_tiles * _R, _L)
    lum = jnp.pad(is_luma, (0, pad)).reshape(n_tiles * _R, _L)
    tile_budget = _TILE * budget
    n_chunks = tile_budget // _CHUNK

    tiles, blen = pl.pallas_call(
        _sym_pack_tile_kernel,
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec((64, _R, _L), lambda i: (0, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((_R, _L), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((_R, _L), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((n_chunks, _CHUNK), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((_R, _L), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((n_tiles * n_chunks, _CHUNK), jnp.uint32),
            jax.ShapeDtypeStruct((n_tiles * _R, _L), jnp.int32),
        ],
        interpret=interpret,
        compiler_params=_COMPILER_PARAMS,
    )(stream_t, dcd, lum)
    return (tiles.reshape(n_tiles, tile_budget),
            blen.reshape(-1)[:n_blocks])


def pack_scan_tiles(coeff_planes, layout: de.ScanLayout,
                    budget_words_per_block: int | None = None,
                    interpret: bool = False):
    """Fused Pallas symbols + pack + per-tile compaction (v3): returns
    (tiles (n_tiles, tile_budget), live (n_tiles,), blen (n_blocks,)).

    blen carries NO row padding — uhdr_join_blocks byte-aligns each
    restart row on the host, producing the same final bytes as the
    pre-padded XLA engine."""
    n_blocks = layout.mcus_h * layout.bpr
    if budget_words_per_block is None:
        budget_words_per_block = de._default_budget(n_blocks)
    stream, dc_diff, is_luma = _stream_inputs(coeff_planes, layout)
    tiles, blen = _pack_tiles_v3(stream, dc_diff, jnp.asarray(is_luma),
                                 budget=budget_words_per_block,
                                 interpret=interpret)
    return tiles, tile_live_words(blen, n_blocks), blen


def pack_scan_device_kernel(coeff_planes, layout: de.ScanLayout,
                            budget_words_per_block: int | None = None,
                            interpret: bool = False):
    """Drop-in pack_scan_device_v2 on the full kernel path (tile pack +
    compact + stitch): returns (out_words, block_len_bits u16), live
    prefix byte-identical to the XLA path."""
    tiles, live, blen = pack_scan_tiles(coeff_planes, layout,
                                        budget_words_per_block, interpret)
    return stitch_tiles([(tiles, live)]), blen.astype(jnp.uint16)


def block_buffers_kernel(coeff_planes, layout: de.ScanLayout,
                         interpret: bool = False):
    """Pallas analog of device_entropy._block_buffers, in the transposed
    layout: returns (bb_t (54, n_pad), blen (n_blocks,))."""
    pays, lens = _slots_for_kernel(coeff_planes, layout)
    return pack_blocks_pallas(pays, lens, interpret=interpret)
