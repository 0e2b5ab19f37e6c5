"""libultrahdr_tpu — TPU-native Ultra HDR (gain map) image codec.

A from-scratch JAX/XLA/Pallas re-design of google/libultrahdr: encode an HDR
rendition into a backward-compatible JPEG_R file (SDR base JPEG + gain map
JPEG + ISO 21496-1/XMP metadata in an MPF container), and decode back to
SDR/linear-F16/HLG/PQ renditions — with the per-pixel math running fused on
TPU and image batches sharding across chips.
"""

__version__ = "1.4.0"  # tracks the reference's UHDR_LIB_VERSION

# Persistent XLA compilation cache: the fused 4K encode program takes
# minutes to compile through a remote-compile TPU attachment but is reused
# across processes.  Disable with UHDR_TPU_NO_CACHE=1.
import os as _os

if not _os.environ.get("UHDR_TPU_NO_CACHE"):
    try:
        import jax as _jax
        _cache = _os.environ.get(
            "UHDR_TPU_CACHE_DIR",
            _os.path.expanduser("~/.cache/uhdr_jax_cache"))
        _os.makedirs(_cache, exist_ok=True)
        _jax.config.update("jax_compilation_cache_dir", _cache)
        _jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:  # cache is an optimization, never a requirement
        pass

from .errors import UhdrError, UhdrErrorCode  # noqa: F401
from .types import (Codec, ColorGamut, ColorRange, ColorTransfer,  # noqa: F401
                    CompressedImage, EncPreset, GainMapMetadata, ImgFmt,
                    ImgLabel, MirrorDirection, RawImage, alloc_raw_image)
from .api import (UhdrDecoder, UhdrEncoder,  # noqa: F401
                  validate_gainmap_metadata)
from .jpegr import is_uhdr_image  # noqa: F401
