"""Fused encode/decode compute steps + batch and multi-chip sharded variants.

Single-image fused steps (`encode_core_p010`, `encode_core_p010_twopass`)
are the XLA re-design of the reference's API-0 hot path
(/root/reference/lib/src/jpegr.cpp:173-231: toneMap -> generateGainMap), with
the JPEG entropy stage excluded (host-side, jpeg/).

Scaling story (replaces the JobQueue thread pool, jpegr.cpp:68-133):

* `encode_batch_p010` — `vmap` over a (B, ...) image batch on one chip.
* `sharded_encode_step(mesh)` — `shard_map` over a ("data", "spatial") mesh:
  images shard across the "data" axis (DP), pixel rows of each image shard
  across the "spatial" axis (SP).  All per-pixel math is pointwise so the
  only cross-shard communication is the two-pass gain min/max reduction,
  which becomes `lax.pmin/pmax` over "spatial" (the reference's mutex-guarded
  per-thread reduction, jpegr.cpp:838-931, turned into an ICI collective).
* `sharded_apply_step(mesh)` — decode-side apply-gainmap under the same
  layout (the GLES fragment-shader analog, gpu/applygainmap_gl.cpp, sharded).

Row-sharding constraints (documented, checked at trace time): the H shard
must be even (4:2:0 chroma quads never straddle shards) and divisible by the
gain map scale factor (box windows never straddle shards) — the same
constraint the reference imposes on its row jobs (2-row granularity for 420,
jpegr.cpp:1994).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P
from jax import shard_map

from ..types import ColorGamut, ColorRange, ColorTransfer, ImgFmt
from ..ops import apply as apply_ops
from ..ops import colors, gainmap as gainmap_ops, pixel
from ..ops import tonemap as tonemap_ops


# ---------------------------------------------------------------------------
# fused single-image compute steps (pure; jit/vmap/shard_map-compatible)

def _encode_pixels_p010(y, uv, *, cg: ColorGamut, ct: ColorTransfer,
                        rng: ColorRange, scale: int, multichannel: bool,
                        gamma: float, use_base_cg: bool = True):
    """P010 HDR planes -> (sdr y/u/v uint8, one-pass gain map uint8).

    The complete API-0 device-side pixel pipeline: unpack -> toneMap ->
    re-quantize -> one-pass gain map (jpegr.cpp:173-231 with preset forced
    REALTIME at :200)."""
    h, w = y.shape
    hdr_vals = pixel.unpack_p010(y, uv, rng, h, w)
    y8, u8, v8 = tonemap_ops.tonemap_to_yuv(hdr_vals, ImgFmt.P010, cg, ct,
                                            out_yuv420=True)
    # gain map reads the quantized SDR rendition, like the reference, which
    # tone-maps into a real YUV420 buffer and re-reads it (jpegr.cpp:193-205)
    sdr_vals = pixel.unpack_yuv8(y8, u8, v8, 2, 2, h, w)
    max_boost = colors.reference_display_peak_nits(ct) / colors.SDR_WHITE_NITS
    gm = gainmap_ops.generate_gainmap_onepass(
        sdr_vals, hdr_vals, sdr_fmt=ImgFmt.YUV420, hdr_fmt=ImgFmt.P010,
        sdr_cg=ColorGamut.DISPLAY_P3, hdr_cg=cg, ct=ct, scale=scale,
        multichannel=multichannel, gamma=gamma, use_luminance=False,
        sdr_is_601=False, use_base_cg=use_base_cg, max_boost=max_boost)
    return y8, u8, v8, gm


@functools.partial(jax.jit, static_argnames=(
    "cg", "ct", "rng", "scale", "multichannel", "gamma"))
def encode_core_p010(y, uv, *, cg=ColorGamut.BT2100, ct=ColorTransfer.HLG,
                     rng=ColorRange.FULL, scale: int = 4,
                     multichannel: bool = False, gamma: float = 1.0):
    """Jitted API-0 REALTIME encode compute step (single image)."""
    return _encode_pixels_p010(y, uv, cg=cg, ct=ct, rng=rng, scale=scale,
                               multichannel=multichannel, gamma=gamma)


def _encode_pixels_p010_twopass(y, uv, *, cg, ct, rng, scale, multichannel,
                                gamma, reduce_axis: str | None = None):
    """BEST_QUALITY two-pass variant: float gains + min/max reduction +
    affine quantize (jpegr.cpp:830-1042).  When `reduce_axis` is given the
    min/max runs as a cross-device collective over that mesh axis."""
    h, w = y.shape
    hdr_vals = pixel.unpack_p010(y, uv, rng, h, w)
    y8, u8, v8 = tonemap_ops.tonemap_to_yuv(hdr_vals, ImgFmt.P010, cg, ct,
                                            out_yuv420=True)
    sdr_vals = pixel.unpack_yuv8(y8, u8, v8, 2, 2, h, w)
    gains, gmin, gmax = gainmap_ops.gainmap_float_pass(
        sdr_vals, hdr_vals, sdr_fmt=ImgFmt.YUV420, hdr_fmt=ImgFmt.P010,
        sdr_cg=ColorGamut.DISPLAY_P3, hdr_cg=cg, ct=ct, scale=scale,
        multichannel=multichannel, use_luminance=False, sdr_is_601=False,
        use_base_cg=True)
    if reduce_axis is not None:
        gmin = jax.lax.pmin(gmin, reduce_axis)
        gmax = jax.lax.pmax(gmax, reduce_axis)
    c = gains.shape[0]
    lo = jnp.clip(gmin, gainmap_ops.GAIN_LOG2_MIN, gainmap_ops.GAIN_LOG2_MAX)
    hi = jnp.clip(gmax, gainmap_ops.GAIN_LOG2_MIN, gainmap_ops.GAIN_LOG2_MAX)
    hi = jnp.where(jnp.abs(hi - lo) < jnp.finfo(jnp.float32).eps, hi + 0.1, hi)
    gm = gainmap_ops.affine_map_gain(gains, lo[:c].reshape(c, 1, 1),
                                     hi[:c].reshape(c, 1, 1),
                                     jnp.float32(gamma))
    return y8, u8, v8, gm, lo, hi


@functools.partial(jax.jit, static_argnames=(
    "cg", "ct", "rng", "scale", "multichannel", "gamma"))
def encode_core_p010_twopass(y, uv, *, cg=ColorGamut.BT2100,
                             ct=ColorTransfer.HLG, rng=ColorRange.FULL,
                             scale: int = 4, multichannel: bool = True,
                             gamma: float = 1.0):
    """Jitted API-0 BEST_QUALITY encode compute step (single image)."""
    return _encode_pixels_p010_twopass(y, uv, cg=cg, ct=ct, rng=rng,
                                       scale=scale, multichannel=multichannel,
                                       gamma=gamma)


@functools.partial(jax.jit, static_argnames=(
    "cg", "ct", "rng", "scale", "multichannel", "gamma"))
def encode_batch_p010(y, uv, *, cg=ColorGamut.BT2100, ct=ColorTransfer.HLG,
                      rng=ColorRange.FULL, scale: int = 4,
                      multichannel: bool = False, gamma: float = 1.0):
    """vmap'd API-0 encode over a (B, H, W) / (B, H/2, W) P010 batch."""
    fn = functools.partial(_encode_pixels_p010, cg=cg, ct=ct, rng=rng,
                           scale=scale, multichannel=multichannel, gamma=gamma)
    return jax.vmap(fn)(y, uv)


# ---------------------------------------------------------------------------
# multi-chip sharding

def make_mesh(n_data: int | None = None, n_spatial: int = 1,
              devices=None) -> Mesh:
    """("data", "spatial") mesh over the available chips.

    data  = image-batch DP (throughput; the default for serving)
    spatial = pixel-row SP within one image (latency on huge images)."""
    devices = np.asarray(devices if devices is not None else jax.devices())
    if n_data is None:
        n_data = devices.size // n_spatial
    devices = devices[: n_data * n_spatial].reshape(n_data, n_spatial)
    return Mesh(devices, axis_names=("data", "spatial"))


def _check_row_shard(h: int, n_spatial: int, scale: int):
    rows = h // n_spatial
    if h % n_spatial or rows % 2 or rows % scale:
        raise ValueError(
            f"spatial sharding needs H ({h}) divisible by n_spatial "
            f"({n_spatial}) with an even per-shard row count divisible by "
            f"the gainmap scale ({scale})")


def sharded_encode_step(mesh: Mesh, *, cg=ColorGamut.BT2100,
                        ct=ColorTransfer.HLG, rng=ColorRange.FULL,
                        scale: int = 4, multichannel: bool = True,
                        gamma: float = 1.0, two_pass: bool = True):
    """Build the jitted multi-chip API-0 encode step.

    Input:  y (B, H, W) uint16, uv (B, H/2, W) uint16 — B shards over
    "data", H over "spatial".  Output: sdr YUV420 planes + gain map (+ the
    resolved log2 bounds for two-pass), identically sharded.

    The two-pass min/max reduction is a pmin/pmax over "spatial" — per
    image, matching the reference's cross-thread reduction semantics
    (jpegr.cpp:838-931); "data"-axis images stay independent."""
    n_spatial = mesh.shape["spatial"]

    def per_image(y, uv):
        if two_pass:
            return _encode_pixels_p010_twopass(
                y, uv, cg=cg, ct=ct, rng=rng, scale=scale,
                multichannel=multichannel, gamma=gamma,
                reduce_axis="spatial" if n_spatial > 1 else None)
        return _encode_pixels_p010(y, uv, cg=cg, ct=ct, rng=rng, scale=scale,
                                   multichannel=multichannel, gamma=gamma)

    img_spec = P("data", "spatial", None)
    plane_specs = (img_spec, img_spec, img_spec, P("data", None, "spatial", None))
    out_specs = plane_specs + ((P("data", None), P("data", None))
                               if two_pass else ())

    @functools.partial(shard_map, mesh=mesh,
                       in_specs=(img_spec, img_spec), out_specs=out_specs,
                       check_vma=False)
    def step(y, uv):
        _check_row_shard(y.shape[1] * n_spatial, n_spatial, scale * 2)
        outs = jax.vmap(per_image)(y, uv)
        if two_pass:
            y8, u8, v8, gm, lo, hi = outs
            return y8, u8, v8, gm, lo, hi
        return outs

    return jax.jit(step)


def sharded_encode_jpeg_step(mesh: Mesh, *, cg=ColorGamut.BT2100,
                             ct=ColorTransfer.HLG, rng=ColorRange.FULL,
                             scale: int = 4, multichannel: bool = False,
                             gamma: float = 1.0, quality: int = 95,
                             map_quality: int = 95,
                             use_base_cg: bool = False):
    """Full multi-chip API-0 encode INCLUDING DCT + Huffman bit packing.

    Because the entropy stream uses one restart segment per MCU row
    (jpeg/device_entropy.py), spatial shards pack their own MCU rows with
    zero cross-shard communication, and the assembled scan is bit-identical
    to the single-device pack (assemble_sharded_scan + tests).  Uses the
    scatter-free v2 packer — the same packer as the single-chip perf path —
    so multi-chip encode reproduces single-chip performance characteristics.

    Input y (B, H, W) u16 / uv (B, H/2, W) u16, B over "data", rows over
    "spatial".  Per-shard H must be a multiple of 16*scale' where scale'
    keeps the gain map's own MCU rows shard-local (scale*8 for YUV400).
    Returns per-image, per-shard (word buffers, block bit lengths) for the
    base and gain-map scans; assemble with assemble_sharded_scan."""
    from ..jpeg import device_entropy
    from ..jpeg.dct import forward_plane
    from ..jpeg.tables import (STD_CHROMA_QUANT, STD_LUMA_QUANT,
                               scaled_quant_table)
    n_spatial = mesh.shape["spatial"]
    qluma = scaled_quant_table(STD_LUMA_QUANT, quality)
    qchroma = scaled_quant_table(STD_CHROMA_QUANT, quality)
    mq = scaled_quant_table(STD_LUMA_QUANT, map_quality)
    mqc = scaled_quant_table(STD_CHROMA_QUANT, map_quality)

    def per_image(y, uv):
        h, w = y.shape
        y8, u8, v8, gm = _encode_pixels_p010(
            y, uv, cg=cg, ct=ct, rng=rng, scale=scale,
            multichannel=multichannel, gamma=gamma,
            use_base_cg=use_base_cg)
        layout = device_entropy.scan_layout(((2, 2), (1, 1), (1, 1)),
                                            w // 16, h // 16)
        base_words, base_blen = device_entropy.pack_scan_device_v2(
            [forward_plane(y8, qluma), forward_plane(u8, qchroma),
             forward_plane(v8, qchroma)], layout)
        mh, mw = h // scale, w // scale
        if multichannel:
            from ..fused import _rgb_to_ycbcr
            gmp = _rgb_to_ycbcr(gm)
            gl = device_entropy.scan_layout(((1, 1),) * 3, mw // 8, mh // 8)
            gm_words, gm_blen = device_entropy.pack_scan_device_v2(
                [forward_plane(gmp[0], mq), forward_plane(gmp[1], mqc),
                 forward_plane(gmp[2], mqc)], gl)
        else:
            gl = device_entropy.scan_layout(((1, 1),), mw // 8, mh // 8)
            gm_words, gm_blen = device_entropy.pack_scan_device_v2(
                [forward_plane(gm[0], mq)], gl)
        return base_words, base_blen, gm_words, gm_blen

    img_spec = P("data", "spatial", None)
    out_specs = (P("data", "spatial"), P("data", "spatial"),
                 P("data", "spatial"), P("data", "spatial"))

    @functools.partial(shard_map, mesh=mesh,
                       in_specs=(img_spec, img_spec), out_specs=out_specs,
                       check_vma=False)
    def step(y, uv):
        h_shard = y.shape[1]
        if h_shard % 16 or (h_shard // scale) % 8:
            raise ValueError(
                f"per-shard rows ({h_shard}) must be a multiple of 16 and "
                f"yield whole gain-map MCU rows (scale {scale})")
        return jax.vmap(per_image)(y, uv)

    return jax.jit(step)


def assemble_sharded_scan(words: np.ndarray, blen: np.ndarray,
                          bpr: int) -> bytes:
    """Join one image's per-shard v2-packed blocks into a final scan.

    words: (n_spatial, cap_words) or flat (n_spatial * cap_words,) u32 —
    stacked per-shard compacted block buffers from
    sharded_encode_jpeg_step; blen: (n_spatial, blocks_local) or flat u16
    block bit lengths.  Each shard's live prefix (total_words_v2 of its
    blens) concatenates in row order, then ONE native join pass emits the
    byte-stuffed, RST-joined scan — identical to the single-device
    fetch_blocks path, and bit-identical to the single-device pack because
    every restart row resets the DC predictor."""
    from ..jpeg import device_entropy, native
    blen = np.asarray(blen)
    n_spatial = blen.shape[0] if blen.ndim == 2 else 1
    blen = blen.reshape(n_spatial, -1)
    words = np.asarray(words).reshape(n_spatial, -1)
    parts = []
    for s in range(n_spatial):
        need = device_entropy.total_words_v2(blen[s])
        if need > words.shape[1]:
            raise device_entropy.PackOverflowError(
                f"shard {s} needs {need} words > budget {words.shape[1]}")
        if device_entropy.use_pack_kernel():
            from ..jpeg import pack_kernel
            pack_kernel.check_tile_budgets(
                blen[s], device_entropy._default_budget(blen[s].size))
        parts.append(words[s, :need])
    return native.join_blocks(np.concatenate(parts), blen.reshape(-1), bpr)


def sharded_apply_step(mesh: Mesh, *, scale_k: int = 1,
                       out_ct=ColorTransfer.HLG,
                       sdr_cg=ColorGamut.DISPLAY_P3,
                       hdr_cg=ColorGamut.BT2100, use_base_cg: bool = True,
                       weight: float = 1.0):
    """Build the jitted multi-chip decode apply-gainmap step.

    Input: sdr_yuv (B, 3, H, W) f32, gain (B, C, H/scale_k, W/scale_k)
    f32-normalized u8 grid, metadata arrays replicated.  B shards over
    "data", rows over "spatial"; all pixel math is pointwise, and for
    scale_k > 1 the IDW map upsample needs exactly ONE map row of halo
    (= `map_scale_factor` image pixels, SURVEY.md §5): each shard pulls the
    next shard's first map row with a `ppermute` over "spatial" and the
    bottom shard clamps to its own last row — the sharded output is
    bit-identical to the single-device apply (tests/test_parallel.py)."""
    n_spatial = mesh.shape["spatial"]

    img_spec = P("data", None, "spatial", None)
    meta_spec = {k: P() for k in ("gamma", "min_content_boost",
                                  "max_content_boost", "offset_sdr",
                                  "offset_hdr")}
    out_spec = P("data", "spatial", None) if out_ct != ColorTransfer.LINEAR \
        else P("data", "spatial", None, None)

    @functools.partial(shard_map, mesh=mesh,
                       in_specs=(img_spec, img_spec, meta_spec),
                       out_specs=out_spec, check_vma=False)
    def step(sdr_yuv, gain, meta):
        halo, is_last = None, None
        if scale_k > 1 and n_spatial > 1:
            first_row = gain[:, :, :1, :]
            halo = jax.lax.ppermute(
                first_row, "spatial",
                [(s + 1, s) for s in range(n_spatial - 1)])
            is_last = jax.lax.axis_index("spatial") == n_spatial - 1
            halo = jnp.where(is_last, gain[:, :, -1:, :], halo)

        def per_image(s, g, h):
            return apply_ops.apply_gainmap_core(
                s, g, meta, scale_k=scale_k, weight=jnp.float32(weight),
                out_ct=out_ct, sdr_cg=sdr_cg, hdr_cg=hdr_cg,
                use_base_cg=use_base_cg, gain_halo_row=h,
                edge_is_last=is_last)

        if halo is None:
            return jax.vmap(lambda s, g: per_image(s, g, None))(sdr_yuv, gain)
        return jax.vmap(per_image)(sdr_yuv, gain, halo)

    return jax.jit(step)
