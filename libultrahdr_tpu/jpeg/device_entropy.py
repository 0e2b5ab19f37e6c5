"""Device-side JPEG baseline Huffman packing — the whole entropy encode as
one XLA program, so only *compressed* bytes cross the host<->device link.

Why: on this system the TPU computes the API-0 pixel pipeline at >100 MP/s
but the host link moves ~25-75 MB/s, so shipping raw DCT coefficients to a
host entropy coder (the classic split; cf. the reference's libjpeg call in
/root/reference/lib/src/jpegencoderhelper.cpp:131-244) caps the codec at a
few MP/s.  Packing the bitstream on device shrinks the transfer to the
actual JPEG scan size (10-20x smaller).

How Huffman coding — a sequential bitstream — becomes a data-parallel XLA
program:

1. One restart segment per MCU row (DRI = mcus_w).  Restart segments are
   byte-aligned and reset the DC predictor (T.81 E.2.4), which removes every
   cross-row dependency; RST markers and byte stuffing are a linear host
   pass (native jpeg_entropy.cpp: uhdr_stuff_scan).
2. Within a row, every block's symbols are computed independently:
   DC diffs via a static previous-same-component gather, AC (run,size)
   symbols via an exclusive cumulative max that finds each coefficient's
   preceding nonzero (the run length), ZRL emission as a per-position
   predicate, EOB as a per-block predicate.  Each block gets a fixed
   65-slot layout [DC, 63 AC positions (each a ZRL or a code — mutually
   exclusive), EOB]; inactive slots have length zero.
3. Codeword bits for every slot come from constant Huffman LUT gathers
   (the reference never enables optimize_coding, so the Annex K default
   tables are compile-time constants).
4. A single exclusive cumsum over all slot lengths yields every symbol's
   absolute bit offset; groups of 4 adjacent slots pre-combine into 4-word
   MSB-aligned segments with vector shift-ors, then five scatter-adds
   place each segment's word contributions (bit ranges are disjoint, so
   add == or).  XLA TPU scatters cost ~11 ns/update, so minimizing update
   count is the encoder's main tuning knob.
5. A per-row pad slot of 1-bits byte-aligns each segment.

The result is bit-identical to the host C++ coder at the same restart
interval (tested in tests/test_device_entropy.py).
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from .tables import (AC_CHROMA, AC_LUMA, DC_CHROMA, DC_LUMA)

# conservative worst-case bits per 8x8 block (DC 26 + 63*(ZRL 16 + code 26)
# + EOB 16); real blocks are far smaller, this only sizes the HBM scratch
_WORST_BLOCK_BITS = 26 + 63 * 26 + 16


class ScanLayout(NamedTuple):
    """Static (compile-time) description of one interleaved scan."""

    sampling: tuple            # ((h,v), ...) per component
    mcus_w: int
    mcus_h: int
    bpr: int                   # blocks per restart row (= per MCU row)
    gather_idx: np.ndarray     # (mcus_h, bpr) -> row index into concat coeffs
    comp_of: np.ndarray        # (bpr,) component id per stream position
    dc_prev: np.ndarray        # (bpr,) previous same-comp position, -1 first
    is_luma: np.ndarray        # (bpr,) bool (component 0)
    cap_words: int


@functools.lru_cache(maxsize=64)
def scan_layout(sampling: tuple, mcus_w: int, mcus_h: int) -> ScanLayout:
    """Build the static stream-order index arrays for an interleaved scan."""
    hmax = max(h for h, _ in sampling)
    n_comp = len(sampling)
    # per-component concat base offsets (blocks flattened row-major)
    widths = [mcus_w * h for h, v in sampling]
    heights = [mcus_h * v for h, v in sampling]
    bases = np.cumsum([0] + [w * h for w, h in zip(widths, heights)])[:-1]

    comp_of, dc_prev, pos_in_row = [], [], []
    last_of_comp = [-1] * n_comp
    for mx in range(mcus_w):
        for c, (hs, vs) in enumerate(sampling):
            for vy in range(vs):
                for vx in range(hs):
                    p = len(comp_of)
                    comp_of.append(c)
                    dc_prev.append(last_of_comp[c])
                    last_of_comp[c] = p
                    pos_in_row.append((c, vy, mx * hs + vx))
    bpr = len(comp_of)

    gather = np.empty((mcus_h, bpr), np.int32)
    for r in range(mcus_h):
        for p, (c, vy, bx) in enumerate(pos_in_row):
            vs = sampling[c][1]
            gather[r, p] = bases[c] + (r * vs + vy) * widths[c] + bx

    total_blocks = mcus_h * bpr
    cap_bits = total_blocks * _WORST_BLOCK_BITS + mcus_h * 8
    return ScanLayout(sampling, mcus_w, mcus_h, bpr, gather,
                      np.asarray(comp_of, np.int32),
                      np.asarray(dc_prev, np.int32),
                      np.asarray(comp_of, np.int32) == 0,
                      -(-cap_bits // 32))


@functools.lru_cache(maxsize=1)
def _huff_luts():
    """(2,256) code/len LUTs for DC and AC, [0]=luma, [1]=chroma."""
    dc_code = np.stack([DC_LUMA.code_of, DC_CHROMA.code_of]).astype(np.uint32)
    dc_len = np.stack([DC_LUMA.size_of, DC_CHROMA.size_of]).astype(np.int32)
    ac_code = np.stack([AC_LUMA.code_of, AC_CHROMA.code_of]).astype(np.uint32)
    ac_len = np.stack([AC_LUMA.size_of, AC_CHROMA.size_of]).astype(np.int32)
    return dc_code, dc_len, ac_code, ac_len


def _bit_size(v):
    """JPEG magnitude category: 0 for 0, else floor(log2(|v|))+1."""
    return 32 - jax.lax.clz(jnp.abs(v).astype(jnp.int32))


def _value_bits(v, size):
    """One's-complement style extra bits (T.81 F.1.2.1)."""
    return jnp.where(v < 0, v + (1 << size) - 1, v).astype(jnp.uint32) \
        & ((jnp.uint32(1) << size.astype(jnp.uint32)) - 1)


def _msb2(pay, length):
    """(pay, len<=32) -> 2-word MSB-aligned segment."""
    sh = jnp.clip(32 - length, 0, 31).astype(jnp.uint32)
    return pay << sh, jnp.zeros_like(pay)


def _append2(a0, a1, alen, pay, length):
    """Append a <=27-bit code to a <=37-bit 2-word segment (result
    <=64 bits)."""
    b = alen & 31
    word1 = alen >= 32
    rem = 32 - b - length
    sh_hi = jnp.clip(rem, 0, 31).astype(jnp.uint32)
    sh_dn = jnp.clip(-rem, 0, 31).astype(jnp.uint32)
    sh_lo = jnp.clip(32 + rem, 0, 31).astype(jnp.uint32)
    hi = jnp.where(rem >= 0, pay << sh_hi, pay >> sh_dn)
    lo = jnp.where(rem < 0, pay << sh_lo, jnp.uint32(0))
    a0 = a0 | jnp.where(word1, jnp.uint32(0), hi)
    a1 = a1 | jnp.where(word1, hi, lo)
    return a0, a1, alen + length


def _append4(a, alen, b, blen):
    """Concat two <=54-bit 2-word segments into a 4-word segment."""
    out = [a[0], a[1], jnp.zeros_like(a[0]), jnp.zeros_like(a[0])]
    wshift = alen >> 5          # 0 or 1 (alen <= 54)
    s = (alen & 31).astype(jnp.uint32)
    ns = (32 - s) & 31
    ns = ns.astype(jnp.uint32)
    nz = s != 0
    b_sh = [jnp.where(nz, b[0] >> s, b[0]),
            jnp.where(nz, (b[1] >> s) | (b[0] << ns), b[1]),
            jnp.where(nz, b[1] << ns, jnp.uint32(0))]
    for i, bw in enumerate(b_sh):
        for base in (0, 1):
            j = i + base
            if j < 4:
                out[j] = out[j] | jnp.where(wshift == base, bw,
                                            jnp.uint32(0))
    return out, alen + blen


def _interleave_stream(per_comp, layout: ScanLayout):
    """Per-component (mcus_h*vs, mcus_w*hs, X) block arrays -> interleaved
    stream order (mcus_h, bpr, X) with pure reshapes/transposes (the
    T.81 A.2.3 MCU interleave; replaces the old 194K-row gather, which XLA
    TPU lowers ~10 ns/row)."""
    mh, mw = layout.mcus_h, layout.mcus_w
    parts = []
    for arr, (hs, vs) in zip(per_comp, layout.sampling):
        x = arr.reshape((mh, vs, mw, hs) + arr.shape[2:])
        x = jnp.moveaxis(x, 1, 2)                 # (mh, mw, vs, hs, X)
        parts.append(x.reshape((mh, mw, vs * hs) + arr.shape[2:]))
    stream = jnp.concatenate(parts, axis=2)       # (mh, mw, bpr_mcu, X)
    return stream.reshape((mh, layout.bpr) + stream.shape[3:])


@functools.lru_cache(maxsize=4)
def _packed_ac_lut(chroma: bool):
    """(256,) u32 AC table with code*32+len packed (<=21 bits)."""
    t = AC_CHROMA if chroma else AC_LUMA
    return (np.asarray(t.code_of, np.uint32) * 32
            + np.asarray(t.size_of, np.uint32))


def _lut256(sym, table_u32: np.ndarray):
    """256-entry table lookup as an unrolled OR-of-selects.

    The alternatives lose on the XLA TPU lowerings: jnp.take gathers cost
    ~10 ns/element (~120 ms for the 12M AC symbols of a 4K frame), and the
    one-hot MXU dot materializes the (N, 256) f32 one-hot in HBM (~12.5 GB
    of traffic at 4K).  The select-sum stays elementwise, XLA fuses the
    terms into one pass, and only the live table entries (~162 of 256 in
    the Annex K AC tables) emit a term."""
    acc = jnp.zeros(sym.shape, jnp.uint32)
    for s in range(256):
        v = int(table_u32[s])
        if v:
            acc = acc | jnp.where(sym == s, jnp.uint32(v), jnp.uint32(0))
    return acc


def _slot_symbols(coeff_planes, layout: ScanLayout):
    """Shared slot-symbol builder: per-block 65-slot (payload, length)
    arrays in stream order, shaped (n_rows, bpr, 65).

    Slot layout per block: [DC, 63 AC positions (ZRL or code), EOB];
    inactive slots have length 0 and payload 0 (T.81 F.1.2).

    Gather-free: symbols are built per component (tables, ZRL and EOB are
    then compile-time constants per plane), AC (code,len) comes from a
    one-hot MXU dot, and the MCU interleave is reshape/transpose."""
    dc_code, dc_len, ac_code, ac_len = _huff_luts()
    mh, mw = layout.mcus_h, layout.mcus_w

    comp_pays, comp_lens = [], []
    for ci, (p, (hs, vs)) in enumerate(zip(coeff_planes, layout.sampling)):
        t = int(ci != 0)                          # 0 = luma tables
        blocks = p.reshape(mh * vs, mw * hs, 64).astype(jnp.int32)

        # ---- DC: previous same-component block in stream order ----------
        dcs = blocks[..., 0].reshape(mh, vs, mw, hs)
        dcs = jnp.moveaxis(dcs, 1, 2).reshape(mh, mw * vs * hs)
        prev = jnp.concatenate([jnp.zeros_like(dcs[:, :1]), dcs[:, :-1]],
                               axis=1)            # predictor resets per row
        diff = dcs - prev
        dsize = _bit_size(diff)
        dcode = jnp.take(jnp.asarray(dc_code[t]), dsize)
        dclen = jnp.take(jnp.asarray(dc_len[t]), dsize)
        dbits = _value_bits(diff, dsize)
        dc_pay = (dcode << dsize.astype(jnp.uint32)) | dbits
        dc_totlen = dclen + dsize                 # (mh, mw*vs*hs)
        nblk = mw * vs * hs
        dc_pay = dc_pay.reshape(mh, nblk, 1)
        dc_totlen = dc_totlen.reshape(mh, nblk, 1)

        # ---- AC (block-local; computed in plane layout) ------------------
        ac = blocks[..., 1:]                      # (bh, bw, 63)
        nz = ac != 0
        k = jnp.arange(1, 64, dtype=jnp.int32)
        idx_nz = jnp.where(nz, k, 0)
        incl = jax.lax.associative_scan(jnp.maximum, idx_nz, axis=-1)
        prev_nz = jnp.concatenate(
            [jnp.zeros_like(incl[..., :1]), incl[..., :-1]], axis=-1)
        last_nz = incl[..., -1:]

        # a position emits either a ZRL (the 16th/32nd/48th zero of a run
        # continuing to a later nonzero) or a (run,size) code (nonzero) —
        # never both, so one slot per position suffices
        d = k - prev_nz
        zrl_on = (~nz) & (d % 16 == 0) & (k < last_nz)
        run = (k - prev_nz - 1) % 16
        asize = _bit_size(ac)
        sym = jnp.where(nz, (run << 4) | asize, 0)
        v = _lut256(sym, _packed_ac_lut(bool(t)))
        acode, aclen = v >> 5, (v & 31).astype(jnp.int32)
        abits = _value_bits(ac, asize)
        zrl_pay = jnp.uint32(ac_code[t, 0xF0])    # constants per plane
        zrl_len = int(ac_len[t, 0xF0])
        ac_pay = jnp.where(nz, (acode << asize.astype(jnp.uint32)) | abits,
                           jnp.where(zrl_on, zrl_pay, 0))
        ac_lens = jnp.where(nz, aclen + asize,
                            jnp.where(zrl_on, zrl_len, 0))

        eob_on = last_nz < 63
        eob_pay = jnp.where(eob_on, jnp.uint32(ac_code[t, 0x00]), 0)
        eob_len = jnp.where(eob_on, int(ac_len[t, 0x00]), 0)

        slots_pay = jnp.concatenate([ac_pay, eob_pay], axis=-1)
        slots_len = jnp.concatenate([ac_lens, eob_len], axis=-1)
        # interleave AC+EOB to stream order, then prepend the DC slot
        # (already stream-ordered)
        single = scan_layout((layout.sampling[ci],), mw, mh)
        s_pay = _interleave_stream([slots_pay], single)
        s_len = _interleave_stream([slots_len], single)
        comp_pays.append((dc_pay, s_pay.reshape(mh, nblk, 64)))
        comp_lens.append((dc_totlen, s_len.reshape(mh, nblk, 64)))

    # stitch components into the MCU-interleaved stream
    pays = _interleave_comp_slots(comp_pays, layout)
    lens = _interleave_comp_slots(comp_lens, layout)
    return pays, lens


def _interleave_comp_slots(per_comp, layout: ScanLayout):
    """[(dc (mh,nblk,1), acs (mh,nblk,64)), ...] -> (mh, bpr, 65)."""
    mh, mw = layout.mcus_h, layout.mcus_w
    parts = []
    for (dc, acs), (hs, vs) in zip(per_comp, layout.sampling):
        x = jnp.concatenate([dc, acs], axis=-1)   # (mh, mw*vs*hs, 65)
        parts.append(x.reshape(mh, mw, vs * hs, 65))
    stream = jnp.concatenate(parts, axis=2)
    return stream.reshape(mh, layout.bpr, 65)


def pack_scan_device(coeff_planes, layout: ScanLayout):
    """Pack an interleaved baseline scan on device.

    coeff_planes: list of (bh, bw, 64) int16/int32 zigzag quantized
    coefficient arrays (MCU padded), one per component, matching `layout`.

    Returns (words (cap_words,) uint32 big-endian bitstream without RST
    markers or byte stuffing, row_byte_offsets (mcus_h + 1,) int32).
    Each restart row is byte-aligned (1-padded) within `words`.
    """
    n_rows, bpr = layout.mcus_h, layout.bpr
    pays, lens = _slot_symbols(coeff_planes, layout)
    pays = pays.reshape(n_rows, bpr * 65)
    lens = lens.reshape(n_rows, bpr * 65)

    # per-row byte-align pad slot (1-bits, T.81 F.1.2.3)
    row_bits = jnp.sum(lens, axis=-1, dtype=jnp.int32)
    pad_len = (-row_bits) % 8
    pad_pay = (jnp.uint32(1) << pad_len.astype(jnp.uint32)) - 1
    pays = jnp.concatenate([pays, pad_pay[:, None]], axis=-1)
    lens = jnp.concatenate([lens, pad_len[:, None]], axis=-1)

    # ---- global bit offsets --------------------------------------------
    flat_pay = pays.reshape(-1)
    flat_len = lens.reshape(-1)
    off = jnp.cumsum(flat_len, dtype=jnp.int32) - flat_len

    # ---- pre-combine groups of 4 adjacent slots -------------------------
    # XLA TPU lowers scatter-add nearly serially (~11 ns/update), so the
    # scatter count dominates the whole encoder.  Four slots (<=27 bits
    # each) concatenate into a <=108-bit MSB-aligned (4 x u32, len) segment
    # with pure vector shifts; the segment then needs 5 scatter updates
    # instead of the slots' 8.
    # row/total offsets must come from the un-padded slot arrays
    slots_per_row = bpr * 65 + 1
    row_start = off.reshape(n_rows, slots_per_row)[:, 0]
    total_bits = off[-1] + flat_len[-1]

    n_flat = flat_pay.shape[0]
    pad_slots = (-n_flat) % 4
    if pad_slots:
        flat_pay = jnp.concatenate(
            [flat_pay, jnp.zeros((pad_slots,), jnp.uint32)])
        flat_len = jnp.concatenate(
            [flat_len, jnp.zeros((pad_slots,), jnp.int32)])
        off = jnp.concatenate(
            [off, jnp.full((pad_slots,), off[-1] + flat_len[-1 - pad_slots],
                           jnp.int32)])
    gp = flat_pay.reshape(-1, 4)
    gl = flat_len.reshape(-1, 4)
    goff = off.reshape(-1, 4)[:, 0]

    s0 = _msb2(gp[:, 0], gl[:, 0])
    a0, a1, alen = _append2(s0[0], s0[1], gl[:, 0], gp[:, 1], gl[:, 1])
    t0 = _msb2(gp[:, 2], gl[:, 2])
    b0, b1, blen = _append2(t0[0], t0[1], gl[:, 2], gp[:, 3], gl[:, 3])
    seg, _ = _append4([a0, a1], alen, [b0, b1], blen)

    # ---- place 4-word segments at their global bit offsets --------------
    w = (goff >> 5).astype(jnp.int32)
    s = (goff & 31).astype(jnp.uint32)
    ns = ((32 - s) & 31).astype(jnp.uint32)
    nz = s != 0
    placed = [jnp.where(nz, seg[0] >> s, seg[0])]
    for i in range(1, 4):
        placed.append(jnp.where(nz, (seg[i] >> s) | (seg[i - 1] << ns),
                                seg[i]))
    placed.append(jnp.where(nz, seg[3] << ns, jnp.uint32(0)))

    words = jnp.zeros((layout.cap_words,), jnp.uint32)
    for d, p in enumerate(placed):
        words = words.at[w + d].add(p, mode="drop", indices_are_sorted=True)

    # row byte offsets: bit offset of each row's first slot / 8, plus total
    row_bytes = jnp.concatenate([row_start >> 3, (total_bits >> 3)[None]])
    return words, row_bytes.astype(jnp.int32)


def words_to_bytes(words):
    """uint32 big-endian words -> (4*n,) uint8 byte stream."""
    b = jnp.stack([(words >> 24), (words >> 16), (words >> 8), words],
                  axis=-1).astype(jnp.uint8)
    return b.reshape(-1)


# ---------------------------------------------------------------------------
# v2 packer: per-block word-aligned segments + inverse-map compaction
#
# The v1 packer's five sorted scatter-adds cost ~11 ns/update on the XLA TPU
# scatter lowering (~300 ms of a 4K frame's ~470 ms device time).  v2 removes
# the big scatter entirely:
#
#   1. slots -> groups of 8 combined into 7-word MSB-aligned segments with
#      static unrolled shift-ors (pure VPU work, no gather/scatter);
#   2. each block's 9 group segments OR into a private 54-word MSB-aligned
#      block buffer via compare-selects (the worst-case block is 1687 bits,
#      T.81 Annex K code lengths; again pure vector work);
#   3. blocks compact word-aligned into the output via an inverse map: one
#      tiny scatter-max of n_blocks start markers, a cummax that labels every
#      output word with its source block, and ONE monotone gather.  Word
#      alignment makes each output word have exactly one source, which is
#      what turns the placement from scatter into gather.
#
# The remaining bit-level join of word-aligned block segments is a single
# sequential pass the host C++ does at memory speed (uhdr_join_blocks),
# fused with the RST insertion + byte stuffing it already performed for v1.

_BLOCK_CAP_WORDS = 54          # ceil(worst-case 1687 bits / 32) + slack
_GROUPS_PER_BLOCK = 9          # 66 slots (65 + row pad) padded to 72 = 9*8


class PackOverflowError(RuntimeError):
    """The static output-word budget was exceeded (adversarial content at
    high quality); the caller must fall back to an unbudgeted packer."""


def _shift_down(words, s):
    """Shift an MSB-aligned word list right by s in [0,32) bits; returns
    len(words)+1 words."""
    ns = ((32 - s) & 31).astype(jnp.uint32)
    nz = s != 0
    out = [jnp.where(nz, words[0] >> s, words[0])]
    for i in range(1, len(words)):
        out.append(jnp.where(nz, (words[i] >> s) | (words[i - 1] << ns),
                             words[i]))
    out.append(jnp.where(nz, words[-1] << ns, jnp.uint32(0)))
    return out


def _append_words(a, alen, b, blen, out_n: int, max_ws: int):
    """Concatenate MSB-aligned segment b after segment a.

    a: list of words, bit length alen; b likewise.  out_n words returned;
    max_ws bounds alen >> 5 (static unroll count)."""
    ws = alen >> 5
    s = (alen & 31).astype(jnp.uint32)
    bs = _shift_down(b, s)
    out = [a[j] if j < len(a) else jnp.zeros_like(a[0]) for j in range(out_n)]
    for k in range(max_ws + 1):
        sel = ws == k
        for i, bw in enumerate(bs):
            j = i + k
            if j < out_n:
                out[j] = out[j] | jnp.where(sel, bw, jnp.uint32(0))
    return out, alen + blen


def _combine8(gp, gl):
    """(.., 8) LSB-aligned payload/len slots -> 7-word MSB-aligned segment
    (list of 7 (..,) u32) + total bit length (slots are <=26 bits, so the
    group is <=208 bits)."""
    # pairs -> 2-word segments (<=52 bits)
    p2, l2 = [], []
    for i in range(4):
        s0 = _msb2(gp[..., 2 * i], gl[..., 2 * i])
        a0, a1, alen = _append2(s0[0], s0[1], gl[..., 2 * i],
                                gp[..., 2 * i + 1], gl[..., 2 * i + 1])
        p2.append([a0, a1])
        l2.append(alen)
    # quads -> 4-word segments (<=104 bits)
    q0, ql0 = _append_words(p2[0], l2[0], p2[1], l2[1], 4, 1)
    q1, ql1 = _append_words(p2[2], l2[2], p2[3], l2[3], 4, 1)
    # oct -> 7-word segment (<=208 bits)
    return _append_words(q0, ql0, q1, ql1, 7, 3)


def _default_budget(n_blocks: int) -> int:
    # small scans get the full worst-case cap (overflow impossible,
    # <=7 MB scratch); big scans get a lean budget with host fallback
    return _BLOCK_CAP_WORDS if n_blocks <= 32768 else 16


def _block_buffers(coeff_planes, layout: ScanLayout):
    """Stages 1-2 of the v2 packer: per-block word buffers.

    Returns (bb (n_blocks, _BLOCK_CAP_WORDS) u32 MSB-aligned block
    bitstreams, blen (n_blocks,) i32 bit lengths).  Row byte-align pad is
    folded into each MCU row's last block."""
    n_rows, bpr = layout.mcus_h, layout.bpr
    n_blocks = n_rows * bpr
    pays, lens = _slot_symbols(coeff_planes, layout)   # (n_rows, bpr, 65)

    # per-row byte-align pad (1-bits, T.81 F.1.2.3) appended to the row's
    # last block as a 66th slot
    row_bits = jnp.sum(lens, axis=(1, 2), dtype=jnp.int32)      # (n_rows,)
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
    zpad = _GROUPS_PER_BLOCK * 8 - 66
    pays = jnp.pad(pays, ((0, 0), (0, zpad)))
    lens = jnp.pad(lens, ((0, 0), (0, zpad)))

    blen = jnp.sum(lens, axis=-1, dtype=jnp.int32)              # (n_blocks,)
    off = jnp.cumsum(lens, axis=-1, dtype=jnp.int32) - lens     # in-block
    goff = off[:, ::8]                          # (n_blocks, 9) group offsets

    gp = pays.reshape(n_blocks, _GROUPS_PER_BLOCK, 8)
    gl = lens.reshape(n_blocks, _GROUPS_PER_BLOCK, 8)
    seg, _ = _combine8(gp, gl)                  # 7 x (n_blocks, 9)

    # shift each group segment to its in-block bit position -> 8 words
    placed = _shift_down(seg, (goff & 31).astype(jnp.uint32))
    gw = goff >> 5                              # (n_blocks, 9) word offsets

    # OR group words into the block buffer via compare-selects (no scatter;
    # contributions beyond a group's real span are zero by construction)
    jidx = jnp.arange(_BLOCK_CAP_WORDS, dtype=jnp.int32)[None, :]
    bb = jnp.zeros((n_blocks, _BLOCK_CAP_WORDS), jnp.uint32)
    for g in range(_GROUPS_PER_BLOCK):
        tgt = gw[:, g:g + 1]
        for d in range(8):
            bb = bb | jnp.where(jidx == tgt + d, placed[d][:, g:g + 1], 0)
    return bb, blen


def _compact_blocks(bb, blen, w_out: int):
    """Stage 3: word-aligned compaction via the word->block inverse map.

    Works on any block set — including several scans' (or several images')
    blocks concatenated along axis 0, which compacts every stream into ONE
    contiguous buffer so the host downloads one prefix (the link pays a
    ~40 ms fixed latency per transfer)."""
    n_blocks = bb.shape[0]
    wlen = (blen + 31) >> 5                                     # >=1 always
    dest = jnp.cumsum(wlen) - wlen
    mark = jnp.zeros((w_out,), jnp.int32).at[dest].max(
        jnp.arange(n_blocks, dtype=jnp.int32), mode="drop",
        indices_are_sorted=True)
    blk = jax.lax.associative_scan(jnp.maximum, mark)
    src = jnp.arange(w_out, dtype=jnp.int32) - jnp.take(dest, blk)
    flat_idx = blk * _BLOCK_CAP_WORDS + jnp.clip(src, 0,
                                                 _BLOCK_CAP_WORDS - 1)
    return jnp.take(bb.reshape(-1), flat_idx)


def use_pack_kernel() -> bool:
    """Stage-2 engine select: the Mosaic/Pallas kernel (pack_kernel.py) on
    accelerators, the XLA tree on CPU (where Mosaic doesn't run compiled).
    UHDR_TPU_PACK_KERNEL=0 forces the XLA path everywhere."""
    import os
    if os.environ.get("UHDR_TPU_PACK_KERNEL", "1") == "0":
        return False
    return jax.default_backend() != "cpu"


def block_buffers_t(coeff_planes, layout: ScanLayout):
    """Engine-dispatched stage 1+2 (+3 on the kernel engine).

    Kernel engine (accelerators): returns (tiles (n_tiles, tile_budget),
    live (n_tiles,), blen) from the fused Pallas pack+compact kernel.
    XLA engine (CPU): returns (bb_t (54, n_blocks), blen) in the
    blocks-in-lanes layout for compact_blocks_t.  compact_scans accepts
    either; bit content of the live stream is engine-independent
    (tests/test_pack_kernel.py)."""
    if use_pack_kernel():
        from . import pack_kernel
        return pack_kernel.pack_scan_tiles(coeff_planes, layout)
    bb, blen = _block_buffers(coeff_planes, layout)
    return bb.T, blen


def pack_scan_device_v2(coeff_planes, layout: ScanLayout,
                        budget_words_per_block: int | None = None):
    """Pack an interleaved baseline scan on device, scatter-free.

    Returns (out_words (n_blocks * budget_words_per_block,) uint32,
    block_len_bits (n_blocks,) uint16).  Each block's bitstream (row pad
    included in the last block of each MCU row) sits word-aligned at the
    word offset cumsum(ceil(len/32)); the host joins them bit-level with
    native.join_blocks.  If the actual stream exceeds the word budget the
    tail is dropped on device — callers must check via
    `total_words(block_len_bits) <= out_words.size` (fetch_blocks raises
    PackOverflowError)."""
    n_blocks = layout.mcus_h * layout.bpr
    if budget_words_per_block is None:
        budget_words_per_block = _default_budget(n_blocks)
    from . import pack_kernel
    if use_pack_kernel():
        return pack_kernel.pack_scan_device_kernel(
            coeff_planes, layout, budget_words_per_block)
    bb, blen = _block_buffers(coeff_planes, layout)
    out_words = pack_kernel.compact_blocks_t(
        bb.T, blen, n_blocks * budget_words_per_block)
    return out_words, blen.astype(jnp.uint16)


def compact_scans(scans):
    """Compact SEVERAL scans' block buffers with one shared inverse map:
    the output holds [scan0 stream][scan1 stream]... contiguously, so all
    streams download as one d2h prefix of total_words_v2(concat(blens))
    words.

    scans: block_buffers_t outputs — kernel-engine (tiles, live, blen)
    triples or XLA-engine (bb_t, blen) pairs — possibly spanning several
    images (batched encode).  Returns (out_words, [blen u16 per scan]);
    the host splits the downloaded prefix at each scan's
    total_words_v2(blen)."""
    from . import pack_kernel
    if len(scans[0]) == 3:
        out_words = pack_kernel.stitch_tiles(
            [(tiles, live) for tiles, live, _ in scans])
        return out_words, [b.astype(jnp.uint16) for _, _, b in scans]
    bbs = [bb for bb, _ in scans]
    blens = [bl for _, bl in scans]
    w_out = sum(bb.shape[1] * _default_budget(bb.shape[1]) for bb in bbs)
    out_words = pack_kernel.compact_blocks_t(jnp.concatenate(bbs, axis=1),
                                             jnp.concatenate(blens), w_out)
    return out_words, [b.astype(jnp.uint16) for b in blens]


def total_words_v2(block_len_bits: np.ndarray) -> int:
    """Host-side: compacted word count implied by the block bit lengths."""
    return int(np.sum((block_len_bits.astype(np.int64) + 31) >> 5))
