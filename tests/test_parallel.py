"""Multi-chip sharding tests on the 8-virtual-device CPU mesh.

Verifies that the shard_map'd encode/apply steps produce bit-identical
results to the single-device fused steps — the TPU analog of the reference's
NEON-vs-scalar equivalence tests (tests/gainmapmath_test.cpp:759,956)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from libultrahdr_tpu import parallel
from libultrahdr_tpu.ops import apply as apply_ops
from libultrahdr_tpu.types import ColorGamut, ColorRange, ColorTransfer


def _p010_batch(b, h, w, seed=0):
    rs = np.random.RandomState(seed)
    y = (rs.randint(0, 1024, (b, h, w)).astype(np.uint16) << 6)
    uv = (rs.randint(0, 1024, (b, h // 2, w)).astype(np.uint16) << 6)
    return y, uv


def test_mesh_axes():
    mesh = parallel.make_mesh(4, 2)
    assert mesh.shape == {"data": 4, "spatial": 2}


@pytest.mark.parametrize("two_pass", [False, True])
def test_sharded_encode_matches_single(two_pass):
    b, h, w = 4, 64, 128
    y, uv = _p010_batch(b, h, w)
    mesh = parallel.make_mesh(4, 2)
    step = parallel.sharded_encode_step(mesh, scale=4, multichannel=True,
                                        two_pass=two_pass)
    outs = jax.block_until_ready(step(y, uv))

    for i in range(b):
        if two_pass:
            ref = parallel.encode_core_p010_twopass(
                y[i], uv[i], scale=4, multichannel=True)
            # XLA reassociates the box-mean/min reductions differently per
            # shard shape: bounds agree to ~1 ulp, the quantized map to +-1
            for got, want in zip(outs[:3], ref[:3]):
                np.testing.assert_array_equal(np.asarray(got[i]),
                                              np.asarray(want))
            gm_got = np.asarray(outs[3][i], np.int16)
            gm_want = np.asarray(ref[3], np.int16)
            assert np.abs(gm_got - gm_want).max() <= 1
            np.testing.assert_allclose(np.asarray(outs[4][i]),
                                       np.asarray(ref[4]), rtol=1e-6)
            np.testing.assert_allclose(np.asarray(outs[5][i]),
                                       np.asarray(ref[5]), rtol=1e-6)
        else:
            ref = parallel.encode_core_p010(y[i], uv[i], scale=4,
                                            multichannel=True)
            for got, want in zip(outs, ref):
                np.testing.assert_array_equal(np.asarray(got[i]),
                                              np.asarray(want))


def test_sharded_apply_matches_single():
    b, h, w = 2, 64, 128
    rs = np.random.RandomState(1)
    sdr = rs.rand(b, 3, h, w).astype(np.float32)
    sdr[:, 1:] -= 0.5
    gain = rs.rand(b, 3, h, w).astype(np.float32)
    meta = {"gamma": np.ones(3, np.float32),
            "min_content_boost": np.ones(3, np.float32),
            "max_content_boost": np.full(3, 4.0, np.float32),
            "offset_sdr": np.zeros(3, np.float32),
            "offset_hdr": np.zeros(3, np.float32)}

    mesh = parallel.make_mesh(2, 4)
    step = parallel.sharded_apply_step(mesh, out_ct=ColorTransfer.HLG)
    got = np.asarray(jax.block_until_ready(step(sdr, gain, meta)))

    for i in range(b):
        want = apply_ops.apply_gainmap_core(
            jnp.asarray(sdr[i]), jnp.asarray(gain[i]), meta, scale_k=1,
            weight=jnp.float32(1.0), out_ct=ColorTransfer.HLG,
            sdr_cg=ColorGamut.DISPLAY_P3, hdr_cg=ColorGamut.BT2100,
            use_base_cg=True)
        np.testing.assert_array_equal(got[i], np.asarray(want))


@pytest.mark.parametrize("scale_k,channels", [(4, 1), (4, 3), (2, 3)])
def test_sharded_apply_scaled_matches_single(scale_k, channels):
    """Row-sharded apply at map scale > 1 (the Android-default config is
    scale 4, jpegr.h:28-43) must be BIT-identical to the single-device
    apply — the ppermute IDW halo (SURVEY.md §5) carries the only
    cross-shard dependency."""
    b, h, w = 2, 64, 128
    rs = np.random.RandomState(3)
    sdr = rs.rand(b, 3, h, w).astype(np.float32)
    sdr[:, 1:] -= 0.5
    gain = rs.randint(0, 256, (b, channels, h // scale_k, w // scale_k)) \
        .astype(np.float32) / 255.0
    meta = {"gamma": np.full(3, 1.3, np.float32),
            "min_content_boost": np.ones(3, np.float32),
            "max_content_boost": np.full(3, 4.0, np.float32),
            "offset_sdr": np.full(3, 1e-7, np.float32),
            "offset_hdr": np.full(3, 1e-7, np.float32)}

    mesh = parallel.make_mesh(2, 4)
    for out_ct in (ColorTransfer.HLG, ColorTransfer.LINEAR):
        step = parallel.sharded_apply_step(mesh, scale_k=scale_k,
                                           out_ct=out_ct)
        got = np.asarray(jax.block_until_ready(step(sdr, gain, meta)))
        for i in range(b):
            want = apply_ops.apply_gainmap_core(
                jnp.asarray(sdr[i]), jnp.asarray(gain[i]), meta,
                scale_k=scale_k, weight=jnp.float32(1.0), out_ct=out_ct,
                sdr_cg=ColorGamut.DISPLAY_P3, hdr_cg=ColorGamut.BT2100,
                use_base_cg=True)
            np.testing.assert_array_equal(got[i], np.asarray(want))


def test_sharded_jpeg_pack_bit_identical():
    """Full sharded encode (DCT + entropy pack per spatial shard) must
    reassemble to the EXACT bytes of the single-device pack — restart rows
    make shards bit-independent."""
    import jax.numpy as jnp
    from libultrahdr_tpu import fused
    from libultrahdr_tpu.jpeg import native
    from libultrahdr_tpu.parallel.batch import (assemble_sharded_scan,
                                                sharded_encode_jpeg_step)

    b, h, w, scale = 2, 64, 128, 2
    y, uv = _p010_batch(b, h, w, seed=11)
    mesh = parallel.make_mesh(2, 4)
    step = sharded_encode_jpeg_step(mesh, scale=scale, multichannel=False)
    bw_s, blen_s, gw_s, glen_s = jax.block_until_ready(step(y, uv))

    for i in range(b):
        # single-device reference scan
        out = fused._fused_api0_p010(
            jnp.asarray(y[i]), jnp.asarray(uv[i]),
            cg=ColorGamut.BT2100, ct=ColorTransfer.HLG,
            rng=ColorRange.FULL, scale=scale, multichannel=False,
            gamma=1.0, quality=95, map_quality=95, use_base_cg=False)
        bl = fused._layout_for(h, w, fused._SAMPLING_420)
        gl = fused._layout_for(h // scale, w // scale, fused._SAMPLING_400)
        blen_all = np.asarray(out[1])
        n_base = bl.mcus_h * bl.bpr
        base_ref, gm_ref = fused.fetch_blocks_multi(
            out[0], [(blen_all[:n_base], bl.bpr),
                     (blen_all[n_base:], gl.bpr)])

        n_sp = mesh.shape["spatial"]
        base_scan = assemble_sharded_scan(
            np.asarray(bw_s[i]), np.asarray(blen_s[i]).reshape(n_sp, -1),
            bl.bpr)
        gm_scan = assemble_sharded_scan(
            np.asarray(gw_s[i]), np.asarray(glen_s[i]).reshape(n_sp, -1),
            gl.bpr)
        # base planes are bitwise-identical across program shapes, so the
        # assembled scan must match the single-device pack EXACTLY
        assert base_scan == base_ref
        # the gain map's box-downsample mean reassociates differently per
        # program shape (+-1 code), so compare DECODED content: wrap both
        # scans in a JPEG and require the pixel difference of the decoded
        # maps to stay within the reassociation budget
        from libultrahdr_tpu.jpeg.decoder import decode_to_planes, parse_jpeg
        from libultrahdr_tpu.jpeg.encoder import assemble_jpeg
        from libultrahdr_tpu.jpeg.tables import (STD_CHROMA_QUANT,
                                                 STD_LUMA_QUANT,
                                                 scaled_quant_table)
        mh, mw = h // scale, w // scale
        q = scaled_quant_table(STD_LUMA_QUANT, 95)
        qc = scaled_quant_table(STD_CHROMA_QUANT, 95)
        planes = []
        for scan in (gm_scan, gm_ref):
            jpg = assemble_jpeg(mh, mw, [(1, 1)], q, qc, scan,
                                dri=-(-mw // 8))
            p = decode_to_planes(jpg, parse_jpeg(jpg))[0][0]
            planes.append(np.asarray(p, np.int16))
        diff = np.abs(planes[0] - planes[1])
        assert diff.max() <= 4, f"decoded gain maps differ by {diff.max()}"
        mse = float(np.mean((planes[0] - planes[1]).astype(np.float64) ** 2))
        psnr = 10 * np.log10(255.0 ** 2 / max(mse, 1e-12))
        assert psnr >= 60.0, f"gain map PSNR {psnr:.1f} dB < 60"


def test_sharded_jpeg_pack_realistic_shape():
    """Same bit-equality contract at a realistic shape (1024x512, the
    scale of a real tile rather than a toy grid): one image, 8-way spatial
    sharding, full DCT + entropy pack per shard."""
    import jax.numpy as jnp
    from libultrahdr_tpu import fused
    from libultrahdr_tpu.parallel.batch import (assemble_sharded_scan,
                                                sharded_encode_jpeg_step)

    b, h, w, scale = 1, 512, 1024, 4
    rs = np.random.RandomState(7)
    yy, xx = np.mgrid[0:h, 0:w].astype(np.float32)
    lum = 460 + 300 * np.sin(xx / 113.0) * np.cos(yy / 87.0) \
        + rs.rand(h, w) * 40
    y = (np.clip(lum, 0, 1023).astype(np.uint16) << 6)[None]
    uv = (rs.randint(300, 700, (b, h // 2, w)).astype(np.uint16) << 6)
    mesh = parallel.make_mesh(1, 8)
    step = sharded_encode_jpeg_step(mesh, scale=scale, multichannel=False)
    bw_s, blen_s, _, _ = jax.block_until_ready(step(y, uv))

    out = fused._fused_api0_p010(
        jnp.asarray(y[0]), jnp.asarray(uv[0]),
        cg=ColorGamut.BT2100, ct=ColorTransfer.HLG, rng=ColorRange.FULL,
        scale=scale, multichannel=False, gamma=1.0, quality=95,
        map_quality=95, use_base_cg=False)
    bl = fused._layout_for(h, w, fused._SAMPLING_420)
    gl = fused._layout_for(h // scale, w // scale, fused._SAMPLING_400)
    blen_all = np.asarray(out[1])
    n_base = bl.mcus_h * bl.bpr
    base_ref, _ = fused.fetch_blocks_multi(
        out[0], [(blen_all[:n_base], bl.bpr), (blen_all[n_base:], gl.bpr)])

    base_scan = assemble_sharded_scan(
        np.asarray(bw_s[0]),
        np.asarray(blen_s[0]).reshape(mesh.shape["spatial"], -1), bl.bpr)
    assert base_scan == base_ref


def test_sharded_8k_full_container_bit_identical():
    """UHDR_MAX_DIMENSION-wide (8192, jpegdecoderhelper.cpp:46-58) image
    spatially sharded across the whole 8-device mesh: the assembled JPEG_R
    container must be BYTE-IDENTICAL to the single-device encode.  At map
    scale 1 there is no box-downsample to reassociate, so base and gain-map
    scans are both exactly reproducible."""
    import jax.numpy as jnp
    from libultrahdr_tpu import fused
    from libultrahdr_tpu.jpegr import JpegR, is_uhdr_image
    from libultrahdr_tpu.parallel.batch import (assemble_sharded_scan,
                                                sharded_encode_jpeg_step)
    from libultrahdr_tpu.types import ColorGamut, ColorTransfer

    h, w, scale = 128, 8192, 1
    rs = np.random.RandomState(5)
    yy, xx = np.mgrid[0:h, 0:w].astype(np.float32)
    lum = 500 + 280 * np.sin(xx / 257.0) * np.cos(yy / 31.0) \
        + rs.rand(h, w) * 30
    y = (np.clip(lum, 0, 1023).astype(np.uint16) << 6)[None]
    uv = (rs.randint(400, 600, (1, h // 2, w)).astype(np.uint16) << 6)

    mesh = parallel.make_mesh(1, 8)
    step = sharded_encode_jpeg_step(mesh, scale=scale, multichannel=False)
    bw_s, blen_s, gw_s, glen_s = jax.block_until_ready(step(y, uv))

    bl = fused._layout_for(h, w, fused._SAMPLING_420)
    gl = fused._layout_for(h // scale, w // scale, fused._SAMPLING_400)
    n_sp = mesh.shape["spatial"]
    base_scan = assemble_sharded_scan(
        np.asarray(bw_s[0]), np.asarray(blen_s[0]).reshape(n_sp, -1), bl.bpr)
    gm_scan = assemble_sharded_scan(
        np.asarray(gw_s[0]), np.asarray(glen_s[0]).reshape(n_sp, -1), gl.bpr)

    jr = JpegR(map_dimension_scale_factor=scale,
               use_multi_channel_gainmap=False)
    md = fused._onepass_metadata(jr, ColorTransfer.HLG, use_base_cg=False)
    sharded_container = fused._assemble_container(
        jr, w, h, 95, base_scan, fused._SAMPLING_420, ColorGamut.DISPLAY_P3,
        scale, gm_scan, md, None, ColorTransfer.HLG, ColorGamut.BT2100)

    # single-device reference: the same fused program, unsharded
    out = fused._fused_api0_p010(
        jnp.asarray(y[0]), jnp.asarray(uv[0]),
        cg=ColorGamut.BT2100, ct=ColorTransfer.HLG, rng=ColorRange.FULL,
        scale=scale, multichannel=False, gamma=1.0, quality=95,
        map_quality=95, use_base_cg=False)
    blen_all = np.asarray(out[1])
    n_base = bl.mcus_h * bl.bpr
    base_ref, gm_ref = fused.fetch_blocks_multi(
        out[0], [(blen_all[:n_base], bl.bpr), (blen_all[n_base:], gl.bpr)])
    single_container = fused._assemble_container(
        jr, w, h, 95, base_ref, fused._SAMPLING_420, ColorGamut.DISPLAY_P3,
        scale, gm_ref, md, None, ColorTransfer.HLG, ColorGamut.BT2100)

    assert base_scan == base_ref
    assert gm_scan == gm_ref
    assert sharded_container == single_container
    assert is_uhdr_image(sharded_container)


def test_row_shard_constraint():
    mesh = parallel.make_mesh(1, 8)
    step = parallel.sharded_encode_step(mesh, scale=4)
    y, uv = _p010_batch(1, 40, 128)  # 40/8 = 5 rows: odd, not /4
    with pytest.raises(ValueError):
        step(y, uv)


def test_mesh_sharded_batched_decode_bit_identical():
    """decode_to_device_batch(mesh=...) shards the batch dim of the one
    vmapped decode program over the mesh's data axis (jpegr.py mesh
    mode); outputs must match the unsharded batch AND the per-image
    path bit-for-bit."""
    from libultrahdr_tpu.jpegr import JpegR
    from libultrahdr_tpu.types import ImgFmt, RawImage

    rs = np.random.RandomState(5)
    jr = JpegR(map_dimension_scale_factor=2,
               use_multi_channel_gainmap=False)
    streams = []
    for k in range(8):
        y = (rs.randint(0, 1024, (32, 32)).astype(np.uint16) << 6)
        uv = (rs.randint(0, 1024, (16, 32)).astype(np.uint16) << 6)
        img = RawImage(ImgFmt.P010, ColorGamut.BT2100, ColorTransfer.HLG,
                       ColorRange.FULL, 32, 32, [y, uv])
        streams.append(jr.encode_api0(img, quality=92))

    mesh = parallel.make_mesh(8, 1)
    sharded = jr.decode_to_device_batch(streams, mesh=mesh)
    plain = jr.decode_to_device_batch(streams)
    singles = [jr.decode_to_device(s) for s in streams]
    for (so, _), (po, _), (io_, _) in zip(sharded, plain, singles):
        np.testing.assert_array_equal(np.asarray(so), np.asarray(po))
        np.testing.assert_array_equal(np.asarray(so), np.asarray(io_))
    # the sharded result really is distributed over the 8 devices
    assert len(sharded[0][0].sharding.device_set) == 8
