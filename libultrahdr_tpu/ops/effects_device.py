"""Device-resident editor effects for the decode path.

The reference accelerates post-decode effects with GLES fragment shaders on
the still-resident texture (apply_{mirror,rotate,crop,resize}_gles,
/root/reference/lib/src/gpu/editorhelper_gl.cpp:1-355), reading pixels back
only once at the end.  This is the TPU analog: the fused decode leaves the
packed output (RGBA1010102/F16) in HBM, effects apply as XLA ops, and the
(slow) device->host download happens once, after all effects.

Semantics match editor.py / editorhelper.cpp exactly:
  - rotate is clockwise (rotate_buffer_clockwise, editorhelper.cpp:21-48);
  - resize is the effect-path nearest-neighbor with INTEGER-division
    strides, including the upscale repeat-row-0 quirk
    (resize_buffer, editorhelper.cpp:77-86);
  - packed pixels (u32 1010102 / 4xu16 F16) move as whole units, like the
    reference's u32/u64 template instantiations (editorhelper.cpp:162-165).

All functions take/return jax arrays shaped (h, w) [packed u32] or
(h, w, 4) [F16 component u16] and never touch the host.
"""

from __future__ import annotations

import jax.numpy as jnp

from ..errors import invalid_param
from ..types import MirrorDirection


def mirror_packed(arr, direction: MirrorDirection):
    axis = 0 if MirrorDirection(direction) == MirrorDirection.VERTICAL else 1
    return jnp.flip(arr, axis=axis)


def rotate_packed(arr, degrees: int):
    if degrees not in (90, 180, 270):
        raise invalid_param(f"unsupported rotation {degrees}")
    k = {90: -1, 180: 2, 270: 1}[degrees]
    return jnp.rot90(arr, k=k, axes=(0, 1))


def crop_packed(arr, left: int, top: int, w: int, h: int):
    return arr[top:top + h, left:left + w]


def resize_packed(arr, dst_w: int, dst_h: int):
    """Nearest with integer strides (resize_buffer, editorhelper.cpp:77-86)."""
    sh, sw = arr.shape[0], arr.shape[1]
    ri = jnp.arange(dst_h) * (sh // dst_h)
    ci = jnp.arange(dst_w) * (sw // dst_w)
    return arr[ri][:, ci]


def apply_effects_packed(arr, effects, base_w: int, base_h: int):
    """Apply an effect queue (api.MirrorEffect/RotateEffect/CropEffect/
    ResizeEffect descriptors) to a device-resident packed image.

    Returns (array, w, h).  Crop/resize coordinate validation matches
    apply_effects (ultrahdr_api.cpp:275-415) for the display image; the
    caller handles the (host-side, tiny) gain-map companion if it needs it.
    """
    from ..api import CropEffect, MirrorEffect, ResizeEffect, RotateEffect
    w, h = base_w, base_h
    for eff in effects:
        if isinstance(eff, MirrorEffect):
            arr = mirror_packed(arr, eff.direction)
        elif isinstance(eff, RotateEffect):
            arr = rotate_packed(arr, eff.degrees)
            if eff.degrees in (90, 270):
                w, h = h, w
        elif isinstance(eff, CropEffect):
            left, right = max(0, eff.left), min(w, eff.right)
            top, bottom = max(0, eff.top), min(h, eff.bottom)
            if right <= left or bottom <= top:
                raise invalid_param("invalid crop dimensions")
            arr = crop_packed(arr, left, top, right - left, bottom - top)
            w, h = right - left, bottom - top
        elif isinstance(eff, ResizeEffect):
            if eff.width <= 0 or eff.height <= 0:
                raise invalid_param(
                    f"unsupported resize dimensions {eff.width}x{eff.height}")
            arr = resize_packed(arr, eff.width, eff.height)
            w, h = eff.width, eff.height
        else:
            raise invalid_param(f"unsupported device effect {eff}")
    return arr, w, h
