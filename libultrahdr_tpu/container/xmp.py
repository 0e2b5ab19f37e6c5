"""XMP gain-map metadata (Adobe hdrgm schema): generate + parse.

Re-implements generateXmpFor{Primary,Secondary}Image and getMetadataFromXMP
(/root/reference/lib/src/jpegrutils.cpp:876-939, 646-874), byte-compatible
with image_io's XmlWriter formatting (third_party/image_io/src/xml/
xml_writer.cc): 2-space indent, one attribute per line, '/>' self-close.

Gain map min/max and HDR capacities are stored in log2 space; gamma and
offsets linear.  Parsing accepts attribute-style hdrgm values, applies the
reference's defaults (min=1.0, gamma=1.0, offsets=1/64, capacity_min=1.0),
and supports the Apple HDRGainMap namespace fallback.
"""

from __future__ import annotations

import math
import re

import numpy as np

from ..errors import UhdrError, UhdrErrorCode, unsupported
from ..types import GainMapMetadata

XMP_NAMESPACE = "http://ns.adobe.com/xap/1.0/"
GAINMAP_URI = "http://ns.adobe.com/hdr-gain-map/1.0/"
CONTAINER_URI = "http://ns.google.com/photos/1.0/container/"
ITEM_URI = "http://ns.google.com/photos/1.0/container/item/"
APPLE_GAINMAP_URI_FRAGMENT = "apple"
JPEGR_VERSION = "1.0"


def _fmt(v) -> str:
    """C++ ostream default float formatting (6 significant digits)."""
    if isinstance(v, str):
        return v
    if isinstance(v, (int, np.integer)):
        return str(int(v))
    return f"{float(v):.6g}"


class _XmlWriter:
    """Python mirror of image_io::XmlWriter (xml_writer.cc)."""

    def __init__(self):
        self.out = []
        self.indent = ""
        self.stack = []  # [name, has_attrs, has_children, has_content]

    def _maybe_close_bracket(self, newline: bool):
        if self.stack and not self.stack[-1][2] and not self.stack[-1][3]:
            self.out.append(">")
            if newline:
                self.out.append("\n")

    def start_element(self, name: str) -> int:
        self._maybe_close_bracket(True)
        depth = len(self.stack)
        if self.stack:
            self.stack[-1][2] = True
        self.stack.append([name, False, False, False])
        self.out.append(f"{self.indent}<{name}")
        self.indent += "  "
        return depth

    def attribute(self, name: str, value, quote=True):
        self.out.append(f"\n{self.indent}{name}=")
        v = _fmt(value)
        self.out.append(f'"{v}"' if quote or True else v)
        self.stack[-1][1] = True

    def xmlns(self, prefix: str, uri: str):
        self.attribute(f"xmlns:{prefix}", uri)

    def finish_element(self):
        if not self.stack:
            return
        self.indent = self.indent[:-2]
        name, has_attrs, has_children, has_content = self.stack.pop()
        if not has_content and not has_children:
            if not has_attrs or has_children:
                self.out.append(self.indent)
            self.out.append("/>\n")
        else:
            if not has_content:
                self.out.append(self.indent)
            self.out.append(f"</{name}>\n")

    def finish_to_depth(self, depth: int):
        while len(self.stack) > depth:
            self.finish_element()

    def finish(self):
        self.finish_to_depth(0)

    def result(self) -> str:
        return "".join(self.out)


def generate_xmp_for_secondary_image(metadata: GainMapMetadata) -> str:
    """generateXmpForSecondaryImage (jpegrutils.cpp:915-939)."""
    w = _XmlWriter()
    w.start_element("x:xmpmeta")
    w.xmlns("x", "adobe:ns:meta/")
    w.attribute("x:xmptk", "Adobe XMP Core 5.1.2")
    w.start_element("rdf:RDF")
    w.xmlns("rdf", "http://www.w3.org/1999/02/22-rdf-syntax-ns#")
    w.start_element("rdf:Description")
    w.xmlns("hdrgm", GAINMAP_URI)
    w.attribute("hdrgm:Version", JPEGR_VERSION)
    w.attribute("hdrgm:GainMapMin", math.log2(float(metadata.min_content_boost[0])))
    w.attribute("hdrgm:GainMapMax", math.log2(float(metadata.max_content_boost[0])))
    w.attribute("hdrgm:Gamma", float(metadata.gamma[0]))
    w.attribute("hdrgm:OffsetSDR", float(metadata.offset_sdr[0]))
    w.attribute("hdrgm:OffsetHDR", float(metadata.offset_hdr[0]))
    w.attribute("hdrgm:HDRCapacityMin", math.log2(float(metadata.hdr_capacity_min)))
    w.attribute("hdrgm:HDRCapacityMax", math.log2(float(metadata.hdr_capacity_max)))
    w.attribute("hdrgm:BaseRenditionIsHDR", "False")
    w.finish()
    return w.result()


def generate_xmp_for_primary_image(secondary_image_length: int,
                                   metadata: GainMapMetadata) -> str:
    """generateXmpForPrimaryImage (jpegrutils.cpp:876-913)."""
    w = _XmlWriter()
    w.start_element("x:xmpmeta")
    w.xmlns("x", "adobe:ns:meta/")
    w.attribute("x:xmptk", "Adobe XMP Core 5.1.2")
    w.start_element("rdf:RDF")
    w.xmlns("rdf", "http://www.w3.org/1999/02/22-rdf-syntax-ns#")
    w.start_element("rdf:Description")
    w.xmlns("Container", CONTAINER_URI)
    w.xmlns("Item", ITEM_URI)
    w.xmlns("hdrgm", GAINMAP_URI)
    w.attribute("hdrgm:Version", JPEGR_VERSION)
    w.start_element("Container:Directory")
    w.start_element("rdf:Seq")
    item_depth = w.start_element("rdf:li")
    w.attribute("rdf:parseType", "Resource")
    w.start_element("Container:Item")
    w.attribute("Item:Semantic", "Primary")
    w.attribute("Item:Mime", "image/jpeg")
    w.finish_to_depth(item_depth)
    w.start_element("rdf:li")
    w.attribute("rdf:parseType", "Resource")
    w.start_element("Container:Item")
    w.attribute("Item:Semantic", "GainMap")
    w.attribute("Item:Mime", "image/jpeg")
    w.attribute("Item:Length", int(secondary_image_length))
    w.finish()
    return w.result()


# ---------------------------------------------------------------------------
# Parsing

_ATTR_RE = re.compile(
    r'([A-Za-z_][\w:.-]*)\s*=\s*"([^"]*)"')
_ELEM_TEXT_RE_TMPL = r'<\s*{tag}\s*>([^<]*)</'


def _collect_hdrgm(xml: str) -> dict:
    """Collect hdrgm:* (and Apple HDRGainMap) fields from attributes or
    element text, prefix-agnostic on the declared namespace prefixes."""
    # map declared prefixes -> uri
    fields = {}
    apple = False
    for name, value in _ATTR_RE.findall(xml):
        if name.startswith("xmlns:"):
            if "apple" in value.lower() and "hdrgainmap" in value.lower():
                apple = True
            continue
        if ":" in name:
            prefix, local = name.split(":", 1)
        else:
            prefix, local = "", name
        fields.setdefault(local, value)
    # element-content style (<hdrgm:GainMapMax>3</hdrgm:GainMapMax>)
    for m in re.finditer(r"<\s*[\w.-]+:(\w+)\s*>([^<]*)<", xml):
        fields.setdefault(m.group(1), m.group(2).strip())
    if "HDRGainMapVersion" in fields:
        apple = True
    return {"fields": fields, "apple": apple}


def strip_xmp_packet(payload: bytes) -> str:
    """Remove the APP1 namespace header + optional xpacket wrapper
    (getMetadataFromXMP, jpegrutils.cpp:668-707)."""
    ns = XMP_NAMESPACE.encode() + b"\x00"
    if payload.startswith(XMP_NAMESPACE.encode()):
        payload = payload[len(ns):]
    start = 0
    for i in range(len(payload) - 1):
        if payload[i:i + 1] == b"<" and payload[i + 1:i + 2] != b"?":
            start = i
            break
    end = len(payload)
    for i in range(len(payload) - 1, 0, -1):
        if payload[i:i + 1] == b">" and payload[i - 1:i] != b"?":
            end = i + 1
            break
    return payload[start:end].decode("utf-8", errors="replace")


def parse_xmp_metadata(payload: bytes, exif: bytes | None = None) -> GainMapMetadata:
    """getMetadataFromXMP (jpegrutils.cpp:646-874).

    Raises UhdrError on missing required fields.  Apple gain maps resolve
    headroom from HDRGainMapHeadroom or the EXIF Apple MakerNote."""
    xml = strip_xmp_packet(payload)
    parsed = _collect_hdrgm(xml)
    f = parsed["fields"]
    md = GainMapMetadata()

    if parsed["apple"]:
        md.gamma[:] = 1.0
        md.min_content_boost[:] = 1.0
        md.offset_sdr[:] = 0.0
        md.offset_hdr[:] = 0.0
        md.hdr_capacity_min = 1.0
        headroom = None
        if "HDRGainMapHeadroom" in f:
            # the reference routes this through getMaxContentBoost, which
            # applies exp2 (jpegrutils.cpp:255-265)
            headroom = 2.0 ** float(f["HDRGainMapHeadroom"])
        elif exif is not None:
            from .exif_apple import get_exif_apple_headroom
            headroom = get_exif_apple_headroom(exif)
        if headroom is None:
            raise UhdrError(UhdrErrorCode.UHDR_CODEC_ERROR,
                            "could not find attribute HDRGainMapHeadroom and "
                            "Exif Headroom missing")
        md.max_content_boost[:] = headroom
        md.hdr_capacity_max = headroom
        md.use_base_cg = True
        return md

    if "Version" not in f:
        raise UhdrError(UhdrErrorCode.UHDR_CODEC_ERROR,
                        "xml parse error, could not find attribute hdrgm:Version")
    if "GainMapMax" not in f:
        raise UhdrError(UhdrErrorCode.UHDR_CODEC_ERROR,
                        "xml parse error, could not find attribute hdrgm:GainMapMax")
    if "HDRCapacityMax" not in f:
        raise UhdrError(UhdrErrorCode.UHDR_CODEC_ERROR,
                        "xml parse error, could not find attribute hdrgm:HDRCapacityMax")

    def flt(key, default):
        if key not in f:
            return default
        try:
            return float(f[key])
        except ValueError:
            raise UhdrError(UhdrErrorCode.UHDR_CODEC_ERROR,
                            f"xml parse error, unable to parse attribute hdrgm:{key}")

    md.max_content_boost[:] = 2.0 ** flt("GainMapMax", 0.0)
    md.hdr_capacity_max = 2.0 ** flt("HDRCapacityMax", 0.0)
    md.min_content_boost[:] = 2.0 ** flt("GainMapMin", 0.0)
    md.gamma[:] = flt("Gamma", 1.0)
    md.offset_sdr[:] = flt("OffsetSDR", 1.0 / 64.0)
    md.offset_hdr[:] = flt("OffsetHDR", 1.0 / 64.0)
    md.hdr_capacity_min = 2.0 ** flt("HDRCapacityMin", 0.0)
    base_is_hdr = f.get("BaseRenditionIsHDR", "False")
    if base_is_hdr == "True":
        raise UhdrError(UhdrErrorCode.UHDR_CODEC_ERROR,
                        "hdr intent as base rendition is not supported")
    md.use_base_cg = True
    return md
