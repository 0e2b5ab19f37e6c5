"""TPU compute layer: color math, pixel packing, tonemap/gainmap/apply."""

from . import apply, colors, gainmap, idw, lut_parity, pixel, tonemap  # noqa: F401
