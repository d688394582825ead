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
    # legacy round-2 stand-in blobs must stay decodable (cached corpora)
    rng = np.random.default_rng(6)
    img = rng.integers(0, 256, (96, 80, 3), dtype=np.uint8)
    dec = C.decode_qlossy(C.encode_qlossy(img))
    assert C.psnr(img, dec) >= 40.0


def test_jpeg_container_structure():
    """The encoder emits REAL JFIF: marker walk finds SOI/APP0/DQT/SOF0/
    DHT/SOS/EOI with spec-conformant lengths (frmts/jpeg/jpgdataset.cpp
    would accept this stream)."""
    import struct

    from gdal_ray.fixtures.generate import make_image

    buf = C.encode_jpeg(make_image(42, 3, 48, 32))
    assert buf[:2] == b"\xff\xd8" and buf[-2:] == b"\xff\xd9"
    pos = 2
    seen = []
    while pos < len(buf) - 2:
        assert buf[pos] == 0xFF
        marker = buf[pos + 1]
        seen.append(marker)
        (ln,) = struct.unpack_from(">H", buf, pos + 2)
        if marker == 0xDA:  # SOS: entropy data follows
            break
        pos += 2 + ln
    assert seen[:2] == [0xE0, 0xDB] and 0xC0 in seen and 0xC4 in seen and seen[-1] == 0xDA
    # SOF0 dims
    sof = buf.index(b"\xff\xc0")
    prec, h, w, nc = struct.unpack_from(">BHHB", buf, sof + 4)
    assert (prec, h, w, nc) == (8, 32, 48, 3)


def test_jpeg_roundtrip_psnr_above_40db():
    """Decode-vs-source PSNR >= 40 dB (the BASELINE.json lossy gate) on
    corpus-statistics images, q92 4:4:4 as the fixture generator encodes."""
    from gdal_ray.fixtures.generate import make_image

    for i, (h, w) in ((1, (64, 64)), (9, (128, 96)), (13, (256, 128))):
        img = make_image(42, i, w, h)
        out = C.decode_image(C.encode_jpeg(img), "jpeg")
        assert out.shape == img.shape
        assert C.psnr(img, out) >= 40.0


def test_jpeg_gray_and_subsampled_paths():
    from gdal_ray.fixtures.generate import make_image
    from gdal_ray.io.jpeg import decode_jpeg, encode_jpeg

    # constant gray: DC-only blocks reconstruct exactly
    g = np.full((24, 40), 131, np.uint8)
    out = decode_jpeg(encode_jpeg(g, quality=90))
    assert out.shape == (24, 40, 1) and int(np.abs(out[:, :, 0].astype(int) - 131).max()) == 0
    # 4:2:0 with odd dimensions decodes at the right size and decent fidelity
    img = make_image(42, 21, 99, 67)
    out = decode_jpeg(encode_jpeg(img, quality=92, subsample=True))
    assert out.shape == img.shape
    assert C.psnr(img, out) >= 33.0


def test_decode_image_dispatch_and_unknown_fmt():
    img = np.zeros((8, 8, 3), np.uint8)
    assert C.decode_image(C.encode_png(img), "png").shape == (8, 8, 3)
    # sniffing: both legacy qlossy and real JFIF blobs dispatch under "jpeg"
    assert C.decode_image(C.encode_qlossy(img), "jpeg").shape == (8, 8, 3)
    assert C.decode_image(C.encode_jpeg(img), "jpeg").shape == (8, 8, 3)
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


def test_png_16bit_roundtrip():
    """16-bit gray + RGB PNGs round-trip exactly (big-endian samples)."""
    from gdal_ray.io.codec import decode_png, encode_png

    rng = np.random.default_rng(81)
    g = rng.integers(0, 65536, (33, 47)).astype(np.uint16)
    out = decode_png(encode_png(g))
    assert out.dtype == np.uint16 and out.shape == (33, 47, 1)
    assert np.array_equal(out[:, :, 0], g)
    rgb = rng.integers(0, 65536, (20, 21, 3)).astype(np.uint16)
    out = decode_png(encode_png(rgb))
    assert out.dtype == np.uint16 and np.array_equal(out, rgb)


def test_png_16bit_sub_filter():
    """Hand-built 16-bit PNG with the Sub filter: the byte-wise bpp=2
    left-neighbor defilter reconstructs the samples exactly."""
    import struct
    import zlib

    from gdal_ray.io.codec import _PNG_SIG, _chunk, decode_png

    vals = np.array([[1000, 1500, 2000, 64000],
                     [0, 65535, 300, 301]], dtype=np.uint16)
    h, w = vals.shape
    be = vals.astype(">u2").view(np.uint8).reshape(h, w * 2)
    rows = []
    for y in range(h):
        line = be[y].astype(np.int32)
        filt = line.copy()
        for x in range(len(line) - 1, 1, -1):
            filt[x] = (line[x] - line[x - 2]) % 256
        rows.append(bytes([1]) + bytes(filt.astype(np.uint8)))
    ihdr = struct.pack(">IIBBBBB", w, h, 16, 0, 0, 0, 0)
    buf = (_PNG_SIG + _chunk(b"IHDR", ihdr)
           + _chunk(b"IDAT", zlib.compress(b"".join(rows)))
           + _chunk(b"IEND", b""))
    out = decode_png(buf)
    assert np.array_equal(out[:, :, 0], vals)


def test_png_palette_with_trns():
    """8-bit palette PNG expands through PLTE (+tRNS alpha) to RGBA."""
    import struct
    import zlib

    from gdal_ray.io.codec import _PNG_SIG, _chunk, decode_png

    idx = np.array([[0, 1, 2], [2, 1, 0]], dtype=np.uint8)
    plte = bytes([255, 0, 0, 0, 255, 0, 0, 0, 255])
    trns = bytes([10, 200])  # entry 2 defaults to opaque
    h, w = idx.shape
    raw = b"".join(bytes([0]) + bytes(idx[y]) for y in range(h))
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 3, 0, 0, 0)
    buf = (_PNG_SIG + _chunk(b"IHDR", ihdr) + _chunk(b"PLTE", plte)
           + _chunk(b"tRNS", trns)
           + _chunk(b"IDAT", zlib.compress(raw)) + _chunk(b"IEND", b""))
    out = decode_png(buf)
    assert out.shape == (2, 3, 4)
    assert tuple(out[0, 0]) == (255, 0, 0, 10)
    assert tuple(out[0, 1]) == (0, 255, 0, 200)
    assert tuple(out[0, 2]) == (0, 0, 255, 255)
    # without tRNS: plain RGB
    buf_rgb = (_PNG_SIG + _chunk(b"IHDR", ihdr) + _chunk(b"PLTE", plte)
               + _chunk(b"IDAT", zlib.compress(raw)) + _chunk(b"IEND", b""))
    out2 = decode_png(buf_rgb)
    assert out2.shape == (2, 3, 3) and tuple(out2[1, 0]) == (0, 0, 255)
