"""Shepard's inverse-distance-weighted gain map upsampling.

Re-design of ShepardsIDW / sampleMap / sampleMap3Channel
(/root/reference/lib/src/gainmapmath.cpp:39-80, 871-1080).

The reference gathers 4 neighbors per output pixel with per-offset weight
tables.  On TPU, gathers are poison; instead we build the 4 neighbor fields
densely — each is the map nearest-replicated to full resolution, with the
"upper" variants edge-clamp-shifted by one map texel first — and blend with
weight fields tiled from the (k, k, 4) Shepard tables.  Everything stays
(C, H, W) elementwise: pure VPU work, fully fusable.

Weight-table edge cases (x_lower==x_upper / y_lower==y_upper at the last map
column/row) select the reference's NR/NB/C tables via two 1-D masks.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np


@functools.lru_cache(maxsize=32)
def shepards_weight_tables(k: int) -> np.ndarray:
    """fillShepardsIDW (gainmapmath.cpp:43-80) for all 4 tables.

    Returns (4, k, k, 4): [table(D,NR,NB,C), off_y, off_x, neighbor(e1..e4)].
    """
    out = np.zeros((4, k, k, 4), np.float32)
    for t, (inc_r, inc_b) in enumerate([(1, 1), (0, 1), (1, 0), (0, 0)]):
        for y in range(k):
            for x in range(k):
                px, py = x / k, y / k
                cx, cy = 0.0, 0.0
                nx, ny = cx + inc_r, cy + inc_b
                d1 = np.hypot(px - cx, py - cy)
                if d1 == 0.0:
                    out[t, y, x] = [1.0, 0.0, 0.0, 0.0]
                else:
                    w = np.array([1.0 / d1,
                                  1.0 / np.hypot(px - cx, py - ny),
                                  1.0 / np.hypot(px - nx, py - cy),
                                  1.0 / np.hypot(px - nx, py - ny)], np.float32)
                    out[t, y, x] = w / w.sum()
    return out


def _shift_clamp(m, axis: int):
    """Shift by one map texel toward the end with edge clamping:
    row i of result = row min(i+1, n-1) of input."""
    sl = [slice(None)] * m.ndim
    last = [slice(None)] * m.ndim
    sl[axis] = slice(1, None)
    last[axis] = slice(-1, None)
    return jnp.concatenate([m[tuple(sl)], m[tuple(last)]], axis=axis)


def _tile_to(x, h: int, w: int):
    """Tile a (k, k) pattern to cover (h, w)."""
    k = x.shape[0]
    reps_h = -(-h // k)
    reps_w = -(-w // k)
    return jnp.tile(x, (reps_h, reps_w))[:h, :w]


def _idw_core(gainmap, down, k: int, out_h: int, out_w: int, rr):
    """Shared IDW evaluation: `down` is the resolved next-map-row field and
    `rr` the bottom-edge table-switch mask ((out_h, 1) bool, possibly traced
    for the sharded variant)."""
    c, mh, mw = gainmap.shape
    # 4 dense neighbor fields (nearest-replicated, 'upper' = clamp-shifted)
    e1 = jnp.repeat(jnp.repeat(gainmap, k, axis=1), k, axis=2)[:, :out_h, :out_w]
    right = _shift_clamp(gainmap, 2)
    both = _shift_clamp(down, 2)
    e2 = jnp.repeat(jnp.repeat(down, k, axis=1), k, axis=2)[:, :out_h, :out_w]
    e3 = jnp.repeat(jnp.repeat(right, k, axis=1), k, axis=2)[:, :out_h, :out_w]
    e4 = jnp.repeat(jnp.repeat(both, k, axis=1), k, axis=2)[:, :out_h, :out_w]

    tables = shepards_weight_tables(k)  # (4, k, k, 4)
    # edge masks: x_lower == x_upper when x//k >= mw-1 (same for y)
    col = (jnp.arange(out_w) // k) >= (mw - 1)   # (W,) right-edge
    cc = col[None, :]

    out = jnp.zeros((c, out_h, out_w), jnp.float32)
    for j in range(4):
        w_d = _tile_to(jnp.asarray(tables[0, :, :, j]), out_h, out_w)
        w_nr = _tile_to(jnp.asarray(tables[1, :, :, j]), out_h, out_w)
        w_nb = _tile_to(jnp.asarray(tables[2, :, :, j]), out_h, out_w)
        w_c = _tile_to(jnp.asarray(tables[3, :, :, j]), out_h, out_w)
        w = jnp.where(rr & cc, w_c, jnp.where(cc, w_nr, jnp.where(rr, w_nb, w_d)))
        out = out + (e1, e2, e3, e4)[j] * w[None]
    return out


def idw_upsample(gainmap, k: int, out_h: int, out_w: int):
    """Integer-factor IDW upsample: (C, mh, mw) float -> (C, out_h, out_w).

    Matches sampleMap/sampleMap3Channel with ShepardsIDW tables
    (gainmapmath.cpp:923-956, 1026-1080)."""
    if k == 1 and gainmap.shape[-2:] == (out_h, out_w):
        return gainmap
    mh = gainmap.shape[1]
    down = _shift_clamp(gainmap, 1)
    rr = ((jnp.arange(out_h) // k) >= (mh - 1))[:, None]   # bottom edge
    return _idw_core(gainmap, down, k, out_h, out_w, rr)


def idw_upsample_sharded(gainmap, halo_row, is_last, k: int, out_h: int,
                         out_w: int):
    """Row-sharded IDW upsample (SURVEY.md: the map box/IDW halo is the only
    cross-shard dependency in apply).

    gainmap: this shard's (C, mh_local, mw) rows; halo_row: (C, 1, mw) —
    the NEXT shard's first map row (from a ppermute over the "spatial"
    axis), or this shard's own last row on the last shard; is_last: traced
    bool scalar — switches the bottom-edge Shepard tables on only where the
    global image edge actually is."""
    mh = gainmap.shape[1]
    ext = jnp.concatenate([gainmap, halo_row], axis=1)
    down = ext[:, 1:, :]
    rr = (((jnp.arange(out_h) // k) >= (mh - 1)) & is_last)[:, None]
    return _idw_core(gainmap, down, k, out_h, out_w, rr)


def idw_upsample_fractional(gainmap, scale: float, out_h: int, out_w: int):
    """Float-factor IDW (sampleMap float variant, gainmapmath.cpp:871-921,
    958-1024): per-pixel distances to the 4 enclosing map texels.

    Uses gathers (jnp.take) — only hit when the gain map dims don't divide
    the base image evenly, which is rare; kept off the hot path."""
    c, mh, mw = gainmap.shape
    x_map = jnp.arange(out_w, dtype=jnp.float32) / scale
    y_map = jnp.arange(out_h, dtype=jnp.float32) / scale
    xl = jnp.clip(jnp.floor(x_map).astype(jnp.int32), 0, mw - 1)
    xu = jnp.clip(xl + 1, 0, mw - 1)
    yl = jnp.clip(jnp.floor(y_map).astype(jnp.int32), 0, mh - 1)
    yu = jnp.clip(yl + 1, 0, mh - 1)

    def take2(m, yy, xx):
        return jnp.take(jnp.take(m, yy, axis=1), xx, axis=2)

    e1 = take2(gainmap, yl, xl)
    e2 = take2(gainmap, yu, xl)
    e3 = take2(gainmap, yl, xu)
    e4 = take2(gainmap, yu, xu)

    dx_l = (x_map - xl.astype(jnp.float32))[None, :]
    dx_u = (x_map - xu.astype(jnp.float32))[None, :]
    dy_l = (y_map - yl.astype(jnp.float32))[:, None]
    dy_u = (y_map - yu.astype(jnp.float32))[:, None]
    d1 = jnp.hypot(dx_l, dy_l)
    d2 = jnp.hypot(dx_l, dy_u)
    d3 = jnp.hypot(dx_u, dy_l)
    d4 = jnp.hypot(dx_u, dy_u)

    eps = 1e-12
    w1, w2, w3, w4 = 1.0 / (d1 + eps), 1.0 / (d2 + eps), 1.0 / (d3 + eps), 1.0 / (d4 + eps)
    tot = w1 + w2 + w3 + w4
    blended = (e1 * w1 + e2 * w2 + e3 * w3 + e4 * w4) / tot
    # exact-hit short-circuits (reference returns the sample when dist == 0)
    blended = jnp.where(d4[None] == 0.0, e4, blended)
    blended = jnp.where(d3[None] == 0.0, e3, blended)
    blended = jnp.where(d2[None] == 0.0, e2, blended)
    blended = jnp.where(d1[None] == 0.0, e1, blended)
    return blended
