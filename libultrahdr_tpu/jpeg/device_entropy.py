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


def pack_scan_device(coeff_planes, layout: ScanLayout):
    """Pack an interleaved baseline scan on device.

    coeff_planes: list of (bh, bw, 64) int16/int32 zigzag quantized
    coefficient arrays (MCU padded), one per component, matching `layout`.

    Returns (words (cap_words,) uint32 big-endian bitstream without RST
    markers or byte stuffing, row_byte_offsets (mcus_h + 1,) int32).
    Each restart row is byte-aligned (1-padded) within `words`.
    """
    dc_code, dc_len, ac_code, ac_len = [jnp.asarray(a) for a in _huff_luts()]
    n_rows, bpr = layout.mcus_h, layout.bpr

    flat = jnp.concatenate(
        [p.reshape(-1, 64).astype(jnp.int32) for p in coeff_planes], axis=0)
    stream = jnp.take(flat, jnp.asarray(layout.gather_idx.reshape(-1)),
                      axis=0)                       # (n_rows*bpr, 64)
    stream = stream.reshape(n_rows, bpr, 64)

    tbl = jnp.asarray((~layout.is_luma).astype(np.int32))      # (bpr,) 0/1

    # ---- DC slot ------------------------------------------------------
    dc = stream[..., 0]                                        # (n_rows, bpr)
    prev_idx = jnp.asarray(layout.dc_prev)
    dc_prev = jnp.where(prev_idx >= 0,
                        jnp.take(dc, jnp.clip(prev_idx, 0), axis=1), 0)
    diff = dc - dc_prev
    dsize = _bit_size(diff)
    dci = tbl[None, :] * 256 + dsize
    dcode = jnp.take(dc_code.reshape(-1), dci)
    dclen = jnp.take(dc_len.reshape(-1), dci)
    dbits = _value_bits(diff, dsize)
    dc_pay = (dcode << dsize.astype(jnp.uint32)) | dbits
    dc_totlen = dclen + dsize                                  # (n_rows, bpr)

    # ---- AC slots -----------------------------------------------------
    ac = stream[..., 1:]                                       # (.., 63)
    nz = ac != 0
    k = jnp.arange(1, 64, dtype=jnp.int32)
    idx_nz = jnp.where(nz, k, 0)
    incl = jax.lax.associative_scan(jnp.maximum, idx_nz, axis=-1)
    prev_nz = jnp.concatenate(
        [jnp.zeros_like(incl[..., :1]), incl[..., :-1]], axis=-1)
    last_nz = incl[..., -1:]                                   # (.., 1)

    # a position emits either a ZRL (it is the 16th/32nd/48th zero of a run
    # that continues to a later nonzero) or a (run,size) code (it is
    # nonzero) — never both, so one slot per position suffices
    d = k - prev_nz                                            # zeros incl. k
    zrl_on = (~nz) & (d % 16 == 0) & (k < last_nz)
    run = (k - prev_nz - 1) % 16
    asize = _bit_size(ac)
    sym = jnp.where(nz, (run << 4) | asize, 0xF0)
    ai = tbl[None, :, None] * 256 + sym
    acode = jnp.take(ac_code.reshape(-1), ai)
    aclen = jnp.take(ac_len.reshape(-1), ai)
    abits = _value_bits(ac, asize)
    slot_on = nz | zrl_on
    ac_pay = jnp.where(slot_on,
                       jnp.where(nz, (acode << asize.astype(jnp.uint32))
                                 | abits, acode), 0)
    ac_lens = jnp.where(slot_on, jnp.where(nz, aclen + asize, aclen), 0)

    eob_on = last_nz[..., 0] < 63
    ei = tbl[None, :] * 256 + 0x00
    eob_pay = jnp.where(eob_on, jnp.take(ac_code.reshape(-1), ei), 0)
    eob_len = jnp.where(eob_on, jnp.take(ac_len.reshape(-1), ei), 0)

    # ---- assemble 65 slots per block ------------------------------------
    pays = jnp.concatenate([dc_pay[..., None], ac_pay, eob_pay[..., None]],
                           axis=-1).reshape(n_rows, bpr * 65)
    lens = jnp.concatenate([dc_totlen[..., None], ac_lens,
                            eob_len[..., None]],
                           axis=-1).reshape(n_rows, bpr * 65)

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
