"""Pure-Python image codec: PPM/PGM (netpbm binary) and 24-bit BMP.

Makes the multimodal image path REAL in-sandbox (the container ships no
PIL/ffmpeg): `stages/multimodal.py:ImageDecodeStage` defaults to
:func:`decode_image`, so payload-bytes → pixel-array decoding is
exercised end-to-end instead of hiding behind an injected codec — the
image sibling of what the int16-PCM reader did for ``AudioWindowStage``.
Formats follow the public specs only (netpbm P5/P6 headers with
whitespace/comment tolerance; Windows BITMAPINFOHEADER, 24 bpp,
uncompressed, bottom-up rows padded to 4 bytes).

A production deployment swaps ``decode_fn`` for Pillow/torchvision to
gain JPEG/PNG; the stage contract (bytes → ``np.uint8`` HxW[x3] array)
is identical.
"""

from __future__ import annotations

import struct

import numpy as np


class ImageFormatError(ValueError):
    """Malformed or unsupported image bytes."""


def _parse_pnm_header(buf: bytes) -> tuple[bytes, int, int, int, int]:
    """(magic, width, height, maxval, data_offset) — netpbm headers are
    ASCII tokens separated by whitespace, with '#' comments to EOL."""
    magic = buf[:2]
    pos = 2
    vals: list[int] = []
    while len(vals) < 3:
        if pos >= len(buf):
            raise ImageFormatError("truncated netpbm header")
        c = buf[pos : pos + 1]
        if c == b"#":
            pos = buf.index(b"\n", pos) + 1
        elif c.isspace():
            pos += 1
        else:
            end = pos
            while end < len(buf) and not buf[end : end + 1].isspace():
                end += 1
            tok = buf[pos:end]
            if not tok.isdigit():
                raise ImageFormatError(f"bad netpbm header token {tok!r}")
            vals.append(int(tok))
            pos = end
    # exactly ONE whitespace byte separates maxval from raster data
    if pos >= len(buf) or not buf[pos : pos + 1].isspace():
        raise ImageFormatError("netpbm header not terminated by whitespace")
    w, h, maxval = vals
    if maxval <= 0 or maxval > 255:
        raise ImageFormatError(f"unsupported netpbm maxval {maxval} (8-bit only)")
    return magic, w, h, maxval, pos + 1


def decode_ppm(buf: bytes) -> np.ndarray:
    """Binary PPM (P6) → (H, W, 3) uint8; binary PGM (P5) → (H, W)."""
    magic, w, h, _, off = _parse_pnm_header(buf)
    channels = 3 if magic == b"P6" else 1
    need = w * h * channels
    raster = buf[off : off + need]
    if len(raster) != need:
        raise ImageFormatError(
            f"netpbm raster truncated: need {need} bytes, have {len(raster)}"
        )
    a = np.frombuffer(raster, np.uint8)
    return a.reshape(h, w, 3) if channels == 3 else a.reshape(h, w)


def decode_bmp(buf: bytes) -> np.ndarray:
    """24-bit uncompressed BMP (BITMAPINFOHEADER) → (H, W, 3) uint8 RGB."""
    if buf[:2] != b"BM" or len(buf) < 54:
        raise ImageFormatError("not a BMP file")
    data_off = struct.unpack_from("<I", buf, 10)[0]
    hdr_size, w, h = struct.unpack_from("<Iii", buf, 14)
    planes, bpp = struct.unpack_from("<HH", buf, 26)
    compression = struct.unpack_from("<I", buf, 30)[0]
    if hdr_size < 40 or planes != 1:
        raise ImageFormatError(f"unsupported BMP header (size {hdr_size})")
    if bpp != 24 or compression != 0:
        raise ImageFormatError(
            f"only 24-bit uncompressed BMP supported (bpp={bpp}, comp={compression})"
        )
    flip = h > 0  # positive height → bottom-up row order
    h = abs(h)
    stride = (w * 3 + 3) & ~3  # rows pad to 4 bytes
    need = stride * h
    raster = buf[data_off : data_off + need]
    if len(raster) != need:
        raise ImageFormatError(
            f"BMP raster truncated: need {need} bytes, have {len(raster)}"
        )
    rows = np.frombuffer(raster, np.uint8).reshape(h, stride)[:, : w * 3]
    img = rows.reshape(h, w, 3)[:, :, ::-1]  # BGR → RGB
    return (img[::-1] if flip else img).copy()


def decode_image(payload: bytes) -> np.ndarray:
    """Sniff the magic bytes and decode. PPM/PGM/BMP in-sandbox; raises
    ``ImageFormatError`` for anything else (the slot where a real codec
    plugs in for JPEG/PNG)."""
    if payload[:2] in (b"P6", b"P5"):
        return decode_ppm(payload)
    if payload[:2] == b"BM":
        return decode_bmp(payload)
    raise ImageFormatError(
        f"unrecognized image magic {payload[:2]!r} — in-sandbox codec handles "
        "PPM/PGM/BMP; supply decode_fn (e.g. PIL.Image.open) for JPEG/PNG"
    )


# --- encoders (tests + synthetic corpora) ------------------------------------


def encode_ppm(img: np.ndarray) -> bytes:
    """(H, W, 3) or (H, W) uint8 → binary PPM (P6) / PGM (P5)."""
    a = np.ascontiguousarray(img, dtype=np.uint8)
    if a.ndim == 3 and a.shape[2] == 3:
        magic = b"P6"
    elif a.ndim == 2:
        magic = b"P5"
    else:
        raise ValueError(f"expected (H,W,3) or (H,W), got {a.shape}")
    h, w = a.shape[:2]
    return magic + f"\n{w} {h}\n255\n".encode() + a.tobytes()


def encode_bmp(img: np.ndarray) -> bytes:
    """(H, W, 3) uint8 RGB → 24-bit uncompressed bottom-up BMP."""
    a = np.ascontiguousarray(img, dtype=np.uint8)
    if a.ndim != 3 or a.shape[2] != 3:
        raise ValueError(f"expected (H,W,3), got {a.shape}")
    h, w = a.shape[:2]
    stride = (w * 3 + 3) & ~3
    rows = np.zeros((h, stride), np.uint8)
    rows[:, : w * 3] = a[::-1, :, ::-1].reshape(h, w * 3)  # bottom-up, BGR
    raster = rows.tobytes()
    header = b"BM" + struct.pack("<IHHI", 54 + len(raster), 0, 0, 54)
    info = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(raster), 2835, 2835, 0, 0)
    return header + info + raster
