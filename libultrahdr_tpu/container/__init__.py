"""Container & metadata layer (host-side, byte-exact).

Replaces the reference's L2 layer (MPF, XMP, ISO 21496-1, ICC) and the
vendored image_io scanner — see SURVEY.md §1 L1/L2.
"""

from . import exif_apple, icc, iso21496, jpegr_container, mpf, segments, xmp  # noqa: F401
