"""Pure-Python PPM/PGM/BMP codec (decode/image_codec.py) — the default
ImageDecodeStage codec that makes the image modality real in-sandbox."""

import numpy as np
import pytest

from commons_codec_ray.decode.image_codec import (
    ImageFormatError,
    decode_bmp,
    decode_image,
    decode_ppm,
    encode_bmp,
    encode_ppm,
)


@pytest.fixture
def rgb():
    return np.random.default_rng(1).integers(0, 256, (5, 7, 3), dtype=np.uint8)


class TestPPM:
    def test_roundtrip_rgb(self, rgb):
        assert (decode_ppm(encode_ppm(rgb)) == rgb).all()

    def test_roundtrip_gray(self):
        g = np.random.default_rng(2).integers(0, 256, (4, 9), dtype=np.uint8)
        out = decode_ppm(encode_ppm(g))
        assert out.shape == (4, 9) and (out == g).all()

    def test_header_comments_and_whitespace(self, rgb):
        raw = encode_ppm(rgb)
        body = raw[raw.index(b"255\n") + 4 :]
        fancy = b"P6 # a comment\n# another\n  7\t5\n# last\n255\n" + body
        assert (decode_ppm(fancy) == rgb).all()

    def test_truncated_raster(self, rgb):
        with pytest.raises(ImageFormatError, match="truncated"):
            decode_ppm(encode_ppm(rgb)[:-1])

    def test_16bit_maxval_rejected(self):
        with pytest.raises(ImageFormatError, match="maxval"):
            decode_ppm(b"P6\n2 2\n65535\n" + bytes(24))

    def test_bad_token(self):
        with pytest.raises(ImageFormatError):
            decode_ppm(b"P6\n2 x\n255\n" + bytes(12))


class TestBMP:
    def test_roundtrip(self, rgb):
        assert (decode_bmp(encode_bmp(rgb)) == rgb).all()

    def test_row_padding(self):
        # width 7 → stride 24 ≠ 21: padding must be stripped exactly
        img = np.arange(7 * 3 * 2, dtype=np.uint8).reshape(2, 7, 3)
        assert (decode_bmp(encode_bmp(img)) == img).all()

    def test_top_down_negative_height(self, rgb):
        raw = bytearray(encode_bmp(rgb))
        import struct

        # flip to top-down: negate height, reorder raster rows
        h, w = rgb.shape[:2]
        struct.pack_into("<i", raw, 22, -h)
        stride = (w * 3 + 3) & ~3
        rows = np.frombuffer(bytes(raw[54:]), np.uint8).reshape(h, stride)
        raw[54:] = rows[::-1].tobytes()
        assert (decode_bmp(bytes(raw)) == rgb).all()

    def test_wrong_bpp_rejected(self, rgb):
        raw = bytearray(encode_bmp(rgb))
        raw[28] = 8
        with pytest.raises(ImageFormatError, match="24-bit"):
            decode_bmp(bytes(raw))

    def test_truncated(self, rgb):
        with pytest.raises(ImageFormatError):
            decode_bmp(encode_bmp(rgb)[:-3])


class TestSniff:
    def test_dispatch(self, rgb):
        assert (decode_image(encode_ppm(rgb)) == rgb).all()
        assert (decode_image(encode_bmp(rgb)) == rgb).all()

    def test_unknown_magic(self):
        with pytest.raises(ImageFormatError, match="magic"):
            decode_image(b"\x89PNG\r\n\x1a\n")
