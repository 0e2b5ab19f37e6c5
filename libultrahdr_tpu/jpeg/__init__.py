"""JPEG codec: TPU DCT/quant + native host entropy coding.

The framework's replacement for the reference's libjpeg dependency
(jpegencoderhelper/jpegdecoderhelper): batched transforms on device,
bit-twiddling in C++ (jpeg/_native), headers in Python.
"""

from .decoder import JpegInfo, decode_to_planes, decode_to_rgba, parse_jpeg  # noqa: F401
from .encoder import JpegEncoder  # noqa: F401
