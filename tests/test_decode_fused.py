"""Fused single-program decode vs the general decode path."""

import numpy as np
import pytest

from libultrahdr_tpu.jpegr import JpegR
from libultrahdr_tpu.types import (ColorGamut, ColorRange, ColorTransfer,
                                   EncPreset, ImgFmt, RawImage)


def _encoded(w=128, h=64, scale=2, multichannel=False):
    rs = np.random.RandomState(9)
    yy, xx = np.mgrid[0:h, 0:w]
    y = (((np.sin(xx / 19.0) * 0.5 + 0.5) * 1023).astype(np.uint16) << 6)
    uv = (rs.randint(300, 700, (h // 2, w)).astype(np.uint16) << 6)
    img = RawImage(ImgFmt.P010, ColorGamut.BT2100, ColorTransfer.HLG,
                   ColorRange.FULL, w, h, [y, uv])
    jr = JpegR(map_dimension_scale_factor=scale,
               use_multi_channel_gainmap=multichannel,
               preset=EncPreset.REALTIME)
    return jr.encode_api0(img, quality=92)


@pytest.mark.parametrize("multichannel", [False, True])
@pytest.mark.parametrize("out_ct", [ColorTransfer.HLG, ColorTransfer.PQ,
                                    ColorTransfer.LINEAR])
def test_fused_decode_matches_general(multichannel, out_ct):
    data = _encoded(multichannel=multichannel)
    jr = JpegR()
    d_f, m_f, gm_f = jr.decode(data, output_ct=out_ct, return_gainmap=True)
    d_g, m_g, gm_g = jr.decode(data, output_ct=out_ct, return_gainmap=True,
                               use_fused=False)
    np.testing.assert_array_equal(np.asarray(gm_f.planes[0]),
                                  np.asarray(gm_g.planes[0]))
    pf, pg = np.asarray(d_f.planes[0]), np.asarray(d_g.planes[0])
    if out_ct == ColorTransfer.LINEAR:
        # u16 half-float components
        np.testing.assert_array_equal(pf, pg)
    else:
        diff = 0
        for s in (0, 10, 20):
            diff = max(diff, int(np.abs(
                ((pf >> s) & 0x3FF).astype(np.int64)
                - ((pg >> s) & 0x3FF).astype(np.int64)).max()))
        assert diff <= 1  # cross-program float reassociation headroom


def test_fused_decode_scale1():
    data = _encoded(scale=1)
    jr = JpegR()
    d_f, _, _ = jr.decode(data, output_ct=ColorTransfer.HLG)
    d_g, _, _ = jr.decode(data, output_ct=ColorTransfer.HLG, use_fused=False)
    pf, pg = np.asarray(d_f.planes[0]), np.asarray(d_g.planes[0])
    for s in (0, 10, 20):
        assert int(np.abs(((pf >> s) & 0x3FF).astype(np.int64)
                          - ((pg >> s) & 0x3FF).astype(np.int64)).max()) <= 1


class TestDecodeBatch:
    """decode_to_device_batch: one coalesced upload + one vmapped program
    per uniform group, bit-identical to the per-image path."""

    def _enc(self, w, h, seed, scale=2, quality=92):
        rs = np.random.RandomState(seed)
        y = (rs.randint(0, 1024, (h, w)).astype(np.uint16) << 6)
        uv = (rs.randint(300, 700, (h // 2, w)).astype(np.uint16) << 6)
        img = RawImage(ImgFmt.P010, ColorGamut.BT2100, ColorTransfer.HLG,
                       ColorRange.FULL, w, h, [y, uv])
        jr = JpegR(map_dimension_scale_factor=scale,
                   preset=EncPreset.REALTIME)
        return jr.encode_api0(img, quality=quality)

    def test_batch_matches_per_image(self):
        streams = [self._enc(96, 64, s) for s in range(3)]
        jr = JpegR()
        outs = jr.decode_to_device_batch(streams,
                                         output_ct=ColorTransfer.HLG)
        assert len(outs) == 3
        for data, (arr, md) in zip(streams, outs):
            ref_arr, ref_md = JpegR().decode_to_device(
                data, output_ct=ColorTransfer.HLG)
            np.testing.assert_array_equal(np.asarray(arr),
                                          np.asarray(ref_arr))
            assert md.hdr_capacity_max == ref_md.hdr_capacity_max

    def test_mixed_shapes_fall_back(self):
        streams = [self._enc(96, 64, 1), self._enc(128, 64, 2),
                   self._enc(96, 64, 3)]
        outs = JpegR().decode_to_device_batch(streams,
                                              output_ct=ColorTransfer.PQ)
        assert len(outs) == 3
        for data, (arr, _) in zip(streams, outs):
            ref_arr, _ = JpegR().decode_to_device(
                data, output_ct=ColorTransfer.PQ)
            np.testing.assert_array_equal(np.asarray(arr),
                                          np.asarray(ref_arr))

    def test_linear_f16_batch(self):
        streams = [self._enc(96, 64, s, scale=1) for s in (5, 6)]
        outs = JpegR().decode_to_device_batch(
            streams, output_ct=ColorTransfer.LINEAR)
        for data, (arr, _) in zip(streams, outs):
            ref_arr, _ = JpegR().decode_to_device(
                data, output_ct=ColorTransfer.LINEAR)
            np.testing.assert_array_equal(np.asarray(arr),
                                          np.asarray(ref_arr))


class TestDecodeMicrobatcher:
    """decode_to_device's transparent request coalescing (the TPU-serving
    default since round 5): concurrent callers must ride ONE
    decode_to_device_batch dispatch and every caller must receive exactly
    the per-image path's bytes."""

    def _enc(self, w, h, seed):
        rs = np.random.RandomState(seed)
        y = (rs.randint(0, 1024, (h, w)).astype(np.uint16) << 6)
        uv = (rs.randint(200, 800, (h // 2, w)).astype(np.uint16) << 6)
        img = RawImage(ImgFmt.P010, ColorGamut.BT2100, ColorTransfer.HLG,
                       ColorRange.FULL, w, h, [y, uv])
        return JpegR(map_dimension_scale_factor=2,
                     preset=EncPreset.REALTIME).encode_api0(img, quality=92)

    def test_concurrent_callers_coalesce(self, monkeypatch):
        import threading
        streams = [self._enc(96, 64, s) for s in range(4)]
        jr = JpegR()
        calls = []
        real_batch = JpegR.decode_to_device_batch

        def spy(self_, xs, *a, **k):
            calls.append(len(xs))
            return real_batch(self_, xs, *a, **k)

        monkeypatch.setattr(JpegR, "decode_to_device_batch", spy)
        ready = threading.Barrier(4)
        outs = [None] * 4

        def worker(i):
            ready.wait()
            outs[i] = jr.decode_to_device(streams[i],
                                          output_ct=ColorTransfer.HLG)

        ts = [threading.Thread(target=worker, args=(i,)) for i in range(4)]
        for t in ts:
            t.start()
        for t in ts:
            t.join()
        # all four landed in one window -> one batch dispatch of size 4
        assert calls and max(calls) >= 2, calls
        for i, (arr, md) in enumerate(outs):
            ref_arr, ref_md = jr.decode_to_device(
                streams[i], output_ct=ColorTransfer.HLG, microbatch=False)
            np.testing.assert_array_equal(np.asarray(arr),
                                          np.asarray(ref_arr))
            assert md.hdr_capacity_max == ref_md.hdr_capacity_max

    def test_single_caller_still_works(self):
        data = self._enc(96, 64, 7)
        jr = JpegR()
        arr, md = jr.decode_to_device(data, output_ct=ColorTransfer.PQ)
        ref, _ = jr.decode_to_device(data, output_ct=ColorTransfer.PQ,
                                     microbatch=False)
        np.testing.assert_array_equal(np.asarray(arr), np.asarray(ref))

    def test_error_isolation(self):
        """A broken stream next to a good one: the good caller succeeds,
        the bad one gets its own exception."""
        import threading
        good = self._enc(96, 64, 8)
        bad = good[:600] + b"\x00" * 40 + good[640:]
        jr = JpegR()
        res = {}
        ready = threading.Barrier(2)

        def worker(name, data):
            ready.wait()
            try:
                res[name] = jr.decode_to_device(data,
                                                output_ct=ColorTransfer.HLG)
            except Exception as e:  # noqa: BLE001
                res[name] = e

        ts = [threading.Thread(target=worker, args=("good", good)),
              threading.Thread(target=worker, args=("bad", bad))]
        for t in ts:
            t.start()
        for t in ts:
            t.join()
        assert not isinstance(res["good"], Exception)
