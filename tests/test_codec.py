"""Codec + hash + checksum kernel tests."""

import numpy as np
import pytest

from gdal_ray.fixtures import oracle as O
from gdal_ray.io import codec as C
from gdal_ray.io import phash as PH
from gdal_ray.raster.checksum import checksum_image


def test_png_roundtrip_rgb_gray_rgba():
    rng = np.random.default_rng(5)
    for shape in [(33, 47, 3), (64, 64, 1), (17, 9, 4), (128, 256, 3)]:
        img = rng.integers(0, 256, shape, dtype=np.uint8)
        out = C.decode_png(C.encode_png(img))
        assert (out == img).all()


def test_png_decoder_handles_up_filter():
    # hand-build a PNG with filter type 2 (Up) rows
    import struct
    import zlib

    img = np.arange(24, dtype=np.uint8).reshape(3, 8)
    raw = bytearray()
    prev = np.zeros(8, np.uint8)
    for y in range(3):
        raw.append(2)
        raw.extend((img[y] - prev).astype(np.uint8).tobytes())
        prev = img[y]
    ihdr = struct.pack(">IIBBBBB", 8, 3, 8, 0, 0, 0, 0)
    blob = (
        b"\x89PNG\r\n\x1a\n"
        + C._chunk(b"IHDR", ihdr)
        + C._chunk(b"IDAT", zlib.compress(bytes(raw)))
        + C._chunk(b"IEND", b"")
    )
    assert (C.decode_png(blob)[:, :, 0] == img).all()


def test_qlossy_psnr_above_40db():
    rng = np.random.default_rng(6)
    img = rng.integers(0, 256, (96, 80, 3), dtype=np.uint8)
    dec = C.decode_qlossy(C.encode_qlossy(img))
    assert C.psnr(img, dec) >= 40.0


def test_decode_image_dispatch_and_unknown_fmt():
    img = np.zeros((8, 8, 3), np.uint8)
    assert C.decode_image(C.encode_png(img), "png").shape == (8, 8, 3)
    assert C.decode_image(C.encode_qlossy(img), "jpeg").shape == (8, 8, 3)
    with pytest.raises(NotImplementedError):
        C.decode_image(b"xxxx", "tiff")


def test_phash_stability_and_sensitivity():
    rng = np.random.default_rng(7)
    img = rng.integers(0, 256, (64, 64, 3), dtype=np.uint8)
    near = np.clip(img.astype(np.int16) + rng.integers(-1, 2, img.shape), 0, 255).astype(np.uint8)
    other = rng.integers(0, 256, (64, 64, 3), dtype=np.uint8)
    h, hn, ho = PH.phash64(img), PH.phash64(near), PH.phash64(other)
    assert PH.hamming64(h, hn) <= 2
    assert PH.hamming64(h, ho) > 10


def test_checksum_matches_scalar_oracle():
    rng = np.random.default_rng(8)
    arr = rng.integers(-5, 300, (37, 53)).astype(np.int32)
    assert checksum_image(arr) == O.checksum_scalar(arr.ravel().tolist())
    # float path: +0.5-floor conversion
    f = arr.astype(np.float64) + 0.25
    conv = np.floor(f + 0.5).astype(np.int64)
    assert checksum_image(f) == O.checksum_scalar(conv.ravel().tolist())
