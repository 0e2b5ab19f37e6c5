"""libultrahdr_tpu — TPU-native Ultra HDR (gain map) image codec.

A from-scratch JAX/XLA/Pallas re-design of google/libultrahdr: encode an HDR
rendition into a backward-compatible JPEG_R file (SDR base JPEG + gain map
JPEG + ISO 21496-1/XMP metadata in an MPF container), and decode back to
SDR/linear-F16/HLG/PQ renditions — with the per-pixel math running fused on
TPU and image batches sharding across chips.
"""

__version__ = "1.4.0"  # tracks the reference's UHDR_LIB_VERSION

from .errors import UhdrError, UhdrErrorCode  # noqa: F401
from .types import (Codec, ColorGamut, ColorRange, ColorTransfer,  # noqa: F401
                    CompressedImage, EncPreset, GainMapMetadata, ImgFmt,
                    ImgLabel, MirrorDirection, RawImage, alloc_raw_image)
from .api import (UhdrDecoder, UhdrEncoder,  # noqa: F401
                  validate_gainmap_metadata)
from .jpegr import is_uhdr_image  # noqa: F401
