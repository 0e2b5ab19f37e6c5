"""On-device decoder effects (ops/effects_device.py): the TPU analog of the
reference's GLES texture-side effects (gpu/editorhelper_gl.cpp:1-355).

Each effect applied on the device-resident packed decode output must match
the host editor (editor.py == editorhelper.cpp semantics) applied to the
downloaded image.
"""

import numpy as np
import pytest

from libultrahdr_tpu import editor
from libultrahdr_tpu.api import (CropEffect, MirrorEffect, ResizeEffect,
                                 RotateEffect)
from libultrahdr_tpu.jpegr import JpegR
from libultrahdr_tpu.types import (ColorGamut, ColorRange, ColorTransfer,
                                   EncPreset, ImgFmt, MirrorDirection,
                                   RawImage)


def _p010(w=96, h=64):
    rs = np.random.RandomState(6)
    y = (rs.randint(0, 1024, (h, w)).astype(np.uint16) << 6)
    uv = (rs.randint(300, 700, (h // 2, w)).astype(np.uint16) << 6)
    return RawImage(ImgFmt.P010, ColorGamut.BT2100, ColorTransfer.HLG,
                    ColorRange.FULL, w, h, [y, uv])


@pytest.fixture(scope="module")
def stream():
    jr = JpegR(map_dimension_scale_factor=2, use_multi_channel_gainmap=False,
               preset=EncPreset.REALTIME)
    return jr.encode_api0(_p010(), quality=92)


@pytest.fixture(scope="module")
def host_decoded(stream):
    dest, _, _ = JpegR().decode(stream, output_ct=ColorTransfer.HLG)
    return dest


def _host_ref(host_decoded, effect):
    img = host_decoded
    if isinstance(effect, MirrorEffect):
        return editor.apply_mirror(img, effect.direction).planes[0]
    if isinstance(effect, RotateEffect):
        return editor.apply_rotate(img, effect.degrees).planes[0]
    if isinstance(effect, CropEffect):
        return editor.apply_crop(img, effect.left, effect.top,
                                 effect.right - effect.left,
                                 effect.bottom - effect.top).planes[0]
    return editor.apply_resize(img, effect.width, effect.height).planes[0]


@pytest.mark.parametrize("effect", [
    MirrorEffect(MirrorDirection.HORIZONTAL),
    MirrorEffect(MirrorDirection.VERTICAL),
    RotateEffect(90),
    RotateEffect(180),
    RotateEffect(270),
    CropEffect(left=8, right=72, top=4, bottom=60),
    ResizeEffect(width=48, height=32),
], ids=["mirror_h", "mirror_v", "rot90", "rot180", "rot270", "crop",
        "resize"])
def test_device_effect_matches_host_editor(stream, host_decoded, effect):
    dev, _ = JpegR().decode_to_device(stream, output_ct=ColorTransfer.HLG,
                                      effects=[effect])
    np.testing.assert_array_equal(np.asarray(dev), _host_ref(host_decoded,
                                                             effect))


def test_device_effect_chain(stream, host_decoded):
    """Effects compose in queue order (apply_effects,
    ultrahdr_api.cpp:275-415)."""
    chain = [RotateEffect(90), MirrorEffect(MirrorDirection.HORIZONTAL),
             CropEffect(left=4, right=52, top=8, bottom=88)]
    dev, _ = JpegR().decode_to_device(stream, output_ct=ColorTransfer.HLG,
                                      effects=chain)
    ref = host_decoded
    ref = editor.apply_rotate(ref, 90)
    ref = editor.apply_mirror(ref, MirrorDirection.HORIZONTAL)
    ref = editor.apply_crop(ref, 4, 8, 48, 80)
    np.testing.assert_array_equal(np.asarray(dev), ref.planes[0])


def test_device_effects_linear_f16(stream):
    """F16 output moves as whole 4xu16 pixels (editorhelper.cpp:162-165)."""
    dev, _ = JpegR().decode_to_device(stream, output_ct=ColorTransfer.LINEAR,
                                      effects=[RotateEffect(180)])
    host, _, _ = JpegR().decode(stream, output_ct=ColorTransfer.LINEAR,
                                output_fmt=ImgFmt.RGBAF16)
    ref = editor.apply_rotate(host, 180)
    np.testing.assert_array_equal(np.asarray(dev), ref.planes[0])
