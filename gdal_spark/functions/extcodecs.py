"""External-library image codecs: HEIF/HEIC and AVIF via the system
libheif / libavif, bound with ctypes.

This mirrors the reference's architecture exactly — frmts/heif links
libheif (heif_context_read_from_memory / heif_decode_image) and
frmts/avif links libavif (avifDecoderReadMemory / avifImageYUVToRGB);
neither codec is re-derivable at pure-Python speed (HEVC/AV1 entropy
coding).  When the shared objects are absent the decoders raise
:class:`ExternalCodecUnavailable`, which the quarantine classifier
maps to ``unsupported_codec`` — so a corpus run degrades instead of
erroring, and upgrades transparently on hosts that have the libs.

ABI notes: libheif's API is opaque-pointer based (only the by-value
``heif_error`` struct is declared).  libavif's ``avifRGBImage`` layout
varies across versions, so instead of hardcoding offsets the binding
calls ``avifRGBImageAllocatePixels`` on an oversized buffer and scans
for the allocated ``pixels`` pointer (the struct's only pointer
field), making it layout-agnostic across 0.10-1.x.
"""

from __future__ import annotations

import ctypes as C
import struct as st

import numpy as np

__all__ = [
    "ExternalCodecUnavailable", "heif_available", "avif_available",
    "heif_decode", "heif_encode", "avif_decode", "avif_encode",
]

_HEIF_SO = "libheif.so.1"
_AVIF_SO = "libavif.so.15"


class ExternalCodecUnavailable(ValueError):
    """The system codec library this format needs is not present."""


class _HeifError(C.Structure):
    _fields_ = [("code", C.c_int), ("subcode", C.c_int),
                ("message", C.c_char_p)]


_heif_lib = None
_avif_lib = None

# libheif enums (public heif.h)
_HEIF_RGB = 1            # heif_colorspace_RGB
_HEIF_ILV = 10           # heif_chroma_interleaved_RGB
_HEIF_CH_ILV = 10        # heif_channel_interleaved
_HEIF_HEVC = 1           # heif_compression_HEVC


def _load_heif():
    global _heif_lib
    if _heif_lib is None:
        try:
            lib = C.CDLL(_HEIF_SO)
        except OSError as exc:
            _heif_lib = False
            raise ExternalCodecUnavailable(
                f"libheif not available: {exc}") from exc
        lib.heif_context_alloc.restype = C.c_void_p
        lib.heif_context_free.argtypes = [C.c_void_p]
        lib.heif_context_read_from_memory_without_copy.restype = _HeifError
        lib.heif_context_read_from_memory_without_copy.argtypes = [
            C.c_void_p, C.c_char_p, C.c_size_t, C.c_void_p]
        lib.heif_context_get_primary_image_handle.restype = _HeifError
        lib.heif_context_get_primary_image_handle.argtypes = [
            C.c_void_p, C.POINTER(C.c_void_p)]
        lib.heif_image_handle_get_width.restype = C.c_int
        lib.heif_image_handle_get_width.argtypes = [C.c_void_p]
        lib.heif_image_handle_get_height.restype = C.c_int
        lib.heif_image_handle_get_height.argtypes = [C.c_void_p]
        lib.heif_image_handle_release.argtypes = [C.c_void_p]
        lib.heif_decode_image.restype = _HeifError
        lib.heif_decode_image.argtypes = [
            C.c_void_p, C.POINTER(C.c_void_p), C.c_int, C.c_int, C.c_void_p]
        lib.heif_image_get_plane_readonly.restype = C.POINTER(C.c_uint8)
        lib.heif_image_get_plane_readonly.argtypes = [
            C.c_void_p, C.c_int, C.POINTER(C.c_int)]
        lib.heif_image_release.argtypes = [C.c_void_p]
        lib.heif_context_get_encoder_for_format.restype = _HeifError
        lib.heif_context_get_encoder_for_format.argtypes = [
            C.c_void_p, C.c_int, C.POINTER(C.c_void_p)]
        lib.heif_image_create.restype = _HeifError
        lib.heif_image_create.argtypes = [
            C.c_int, C.c_int, C.c_int, C.c_int, C.POINTER(C.c_void_p)]
        lib.heif_image_add_plane.restype = _HeifError
        lib.heif_image_add_plane.argtypes = [
            C.c_void_p, C.c_int, C.c_int, C.c_int, C.c_int]
        lib.heif_image_get_plane.restype = C.POINTER(C.c_uint8)
        lib.heif_image_get_plane.argtypes = [
            C.c_void_p, C.c_int, C.POINTER(C.c_int)]
        lib.heif_context_encode_image.restype = _HeifError
        lib.heif_context_encode_image.argtypes = [
            C.c_void_p, C.c_void_p, C.c_void_p, C.c_void_p,
            C.POINTER(C.c_void_p)]
        lib.heif_context_write_to_file.restype = _HeifError
        lib.heif_context_write_to_file.argtypes = [C.c_void_p, C.c_char_p]
        _heif_lib = lib
    if _heif_lib is False:
        raise ExternalCodecUnavailable("libheif not available")
    return _heif_lib


def heif_available() -> bool:
    try:
        _load_heif()
        return True
    except ExternalCodecUnavailable:
        return False


def _hcheck(err: _HeifError, what: str) -> None:
    if err.code != 0:
        msg = (err.message or b"?").decode("utf-8", "replace")
        raise ValueError(f"heif {what} failed: {msg}")


def heif_decode(data: bytes) -> np.ndarray:
    """HEIF/HEIC bytes -> (h, w, 3) uint8 RGB (primary image)."""
    lib = _load_heif()
    data = bytes(data)
    ctx = lib.heif_context_alloc()
    try:
        _hcheck(lib.heif_context_read_from_memory_without_copy(
            ctx, data, len(data), None), "read")
        hdl = C.c_void_p()
        _hcheck(lib.heif_context_get_primary_image_handle(
            ctx, C.byref(hdl)), "primary handle")
        try:
            w = lib.heif_image_handle_get_width(hdl)
            h = lib.heif_image_handle_get_height(hdl)
            img = C.c_void_p()
            _hcheck(lib.heif_decode_image(
                hdl, C.byref(img), _HEIF_RGB, _HEIF_ILV, None), "decode")
            try:
                stride = C.c_int()
                p = lib.heif_image_get_plane_readonly(
                    img, _HEIF_CH_ILV, C.byref(stride))
                if not p:
                    raise ValueError("heif: no interleaved plane")
                arr = np.ctypeslib.as_array(p, (h, stride.value))
                return arr[:, : w * 3].reshape(h, w, 3).copy()
            finally:
                lib.heif_image_release(img)
        finally:
            lib.heif_image_handle_release(hdl)
    finally:
        lib.heif_context_free(ctx)


def heif_encode(img: np.ndarray) -> bytes:
    """(h, w, 3) uint8 RGB -> HEIC (HEVC) bytes, default encoder opts."""
    import os
    import tempfile

    lib = _load_heif()
    img = np.ascontiguousarray(img, np.uint8)
    if img.ndim == 2:
        img = np.stack([img] * 3, -1)
    h, w, _ = img.shape
    ctx = lib.heif_context_alloc()
    try:
        enc = C.c_void_p()
        _hcheck(lib.heif_context_get_encoder_for_format(
            ctx, _HEIF_HEVC, C.byref(enc)), "get encoder")
        him = C.c_void_p()
        _hcheck(lib.heif_image_create(
            w, h, _HEIF_RGB, _HEIF_ILV, C.byref(him)), "image create")
        _hcheck(lib.heif_image_add_plane(
            him, _HEIF_CH_ILV, w, h, 24), "add plane")
        stride = C.c_int()
        p = lib.heif_image_get_plane(him, _HEIF_CH_ILV, C.byref(stride))
        buf = np.ctypeslib.as_array(p, (h, stride.value))
        buf[:, : w * 3] = img.reshape(h, w * 3)
        _hcheck(lib.heif_context_encode_image(
            ctx, him, enc, None, None), "encode")
        fn = tempfile.mktemp(suffix=".heic")
        try:
            _hcheck(lib.heif_context_write_to_file(ctx, fn.encode()),
                    "write")
            with open(fn, "rb") as f:
                return f.read()
        finally:
            if os.path.exists(fn):
                os.remove(fn)
    finally:
        lib.heif_context_free(ctx)


# ---------------------------------------------------------------------------
# libavif
# ---------------------------------------------------------------------------

_AVIF_RGBBUF = 512  # oversized avifRGBImage shell


def _load_avif():
    global _avif_lib
    if _avif_lib is None:
        try:
            lib = C.CDLL(_AVIF_SO)
        except OSError:
            try:
                lib = C.CDLL("libavif.so")
            except OSError as exc:
                _avif_lib = False
                raise ExternalCodecUnavailable(
                    f"libavif not available: {exc}") from exc
        lib.avifDecoderCreate.restype = C.c_void_p
        lib.avifDecoderDestroy.argtypes = [C.c_void_p]
        lib.avifImageCreateEmpty.restype = C.c_void_p
        lib.avifImageCreate.restype = C.c_void_p
        lib.avifImageCreate.argtypes = [C.c_uint32, C.c_uint32, C.c_uint32,
                                        C.c_int]
        lib.avifImageDestroy.argtypes = [C.c_void_p]
        lib.avifDecoderReadMemory.restype = C.c_int
        lib.avifDecoderReadMemory.argtypes = [C.c_void_p, C.c_void_p,
                                              C.c_char_p, C.c_size_t]
        lib.avifRGBImageSetDefaults.argtypes = [C.c_void_p, C.c_void_p]
        lib.avifRGBImageAllocatePixels.argtypes = [C.c_void_p]
        lib.avifRGBImageFreePixels.argtypes = [C.c_void_p]
        lib.avifImageYUVToRGB.restype = C.c_int
        lib.avifImageYUVToRGB.argtypes = [C.c_void_p, C.c_void_p]
        lib.avifImageRGBToYUV.restype = C.c_int
        lib.avifImageRGBToYUV.argtypes = [C.c_void_p, C.c_void_p]
        lib.avifEncoderCreate.restype = C.c_void_p
        lib.avifEncoderDestroy.argtypes = [C.c_void_p]
        lib.avifEncoderWrite.restype = C.c_int
        lib.avifEncoderWrite.argtypes = [C.c_void_p, C.c_void_p, C.c_void_p]
        lib.avifRWDataFree.argtypes = [C.c_void_p]
        _avif_lib = lib
    if _avif_lib is False:
        raise ExternalCodecUnavailable("libavif not available")
    return _avif_lib


def avif_available() -> bool:
    try:
        _load_avif()
        return True
    except ExternalCodecUnavailable:
        return False


class _AvifRW(C.Structure):
    _fields_ = [("data", C.POINTER(C.c_uint8)), ("size", C.c_size_t)]


def _avif_rgb_shell(lib, img_ptr):
    """avifRGBImage in an oversized buffer: defaults from the image,
    format forced to 8-bit RGB, pixels allocated; returns
    (shell, pixels_addr, row_bytes, width, height)."""
    buf = C.create_string_buffer(_AVIF_RGBBUF)
    lib.avifRGBImageSetDefaults(buf, img_ptr)
    # format field: 4th uint32 (w, h, depth, format) — stable prefix
    C.memmove(C.addressof(buf) + 12, (1).to_bytes(4, "little"), 4)  # RGB
    lib.avifRGBImageAllocatePixels(buf)
    raw = bytes(buf.raw)
    w, h = st.unpack_from("<II", raw, 0)
    for off in range(16, 256, 8):
        (p,) = st.unpack_from("<Q", raw, off)
        if p > 0x10000:
            (rb,) = st.unpack_from("<I", raw, off + 8)
            if w * 3 <= rb <= w * 3 + 256:
                return buf, p, rb, w, h
    raise ValueError("avif: RGB pixel buffer not located")


def avif_decode(data: bytes) -> np.ndarray:
    """AVIF bytes -> (h, w, 3) uint8 RGB."""
    lib = _load_avif()
    data = bytes(data)
    dec = lib.avifDecoderCreate()
    img = lib.avifImageCreateEmpty()
    try:
        res = lib.avifDecoderReadMemory(dec, img, data, len(data))
        if res != 0:
            raise ValueError(f"avif decode failed (result {res})")
        shell, p, rb, w, h = _avif_rgb_shell(lib, img)
        try:
            res = lib.avifImageYUVToRGB(img, shell)
            if res != 0:
                raise ValueError(f"avif YUV->RGB failed (result {res})")
            arr = np.frombuffer((C.c_uint8 * (rb * h)).from_address(p),
                                np.uint8).reshape(h, rb)
            return arr[:, : w * 3].reshape(h, w, 3).copy()
        finally:
            lib.avifRGBImageFreePixels(shell)
    finally:
        lib.avifImageDestroy(img)
        lib.avifDecoderDestroy(dec)


def avif_encode(img: np.ndarray) -> bytes:
    """(h, w, 3) uint8 RGB -> AVIF bytes (YUV420, default quality)."""
    lib = _load_avif()
    img = np.ascontiguousarray(img, np.uint8)
    if img.ndim == 2:
        img = np.stack([img] * 3, -1)
    h, w, _ = img.shape
    aimg = lib.avifImageCreate(w, h, 8, 1)  # AVIF_PIXEL_FORMAT_YUV420
    enc = lib.avifEncoderCreate()
    try:
        shell, p, rb, _, _ = _avif_rgb_shell(lib, aimg)
        try:
            arr = np.frombuffer((C.c_uint8 * (rb * h)).from_address(p),
                                np.uint8).reshape(h, rb)
            arr[:, : w * 3] = img.reshape(h, w * 3)
            res = lib.avifImageRGBToYUV(aimg, shell)
            if res != 0:
                raise ValueError(f"avif RGB->YUV failed (result {res})")
        finally:
            lib.avifRGBImageFreePixels(shell)
        out = _AvifRW()
        res = lib.avifEncoderWrite(enc, aimg, C.byref(out))
        if res != 0:
            raise ValueError(f"avif encode failed (result {res})")
        try:
            return bytes(np.ctypeslib.as_array(out.data, (out.size,)))
        finally:
            lib.avifRWDataFree(C.byref(out))
    finally:
        lib.avifEncoderDestroy(enc)
        lib.avifImageDestroy(aimg)
