"""Pure-numpy/stdlib-zlib PNG codec (functions/png.py): lossless
round trips, every scanline filter, palette streams, and the
multimodal wiring."""
import struct
import zlib

import numpy as np
import pyarrow as pa
import pytest

from pyschema_ray.functions.png import decode_png, encode_png


def _chunk(typ: bytes, data: bytes) -> bytes:
    return struct.pack(">I", len(data)) + typ + data \
        + struct.pack(">I", zlib.crc32(typ + data) & 0xFFFFFFFF)


def _png(w, h, color_type, rows: bytes, extra=b"") -> bytes:
    return b"\x89PNG\r\n\x1a\n" + _chunk(
        b"IHDR", struct.pack(">IIBBBBB", w, h, 8, color_type, 0, 0, 0)) \
        + extra + _chunk(b"IDAT", zlib.compress(rows)) \
        + _chunk(b"IEND", b"")


def test_rgb_round_trip_exact():
    rng = np.random.default_rng(3)
    img = rng.integers(0, 256, (37, 53, 3), dtype=np.uint8)
    assert np.array_equal(decode_png(encode_png(img)), img)


def test_grey_and_rgba_round_trips():
    rng = np.random.default_rng(4)
    g = rng.integers(0, 256, (21, 17), dtype=np.uint8)
    assert np.array_equal(decode_png(encode_png(g)),
                          np.repeat(g[:, :, None], 3, axis=2))
    rgba = rng.integers(0, 256, (9, 11, 4), dtype=np.uint8)
    assert np.array_equal(decode_png(encode_png(rgba)), rgba[:, :, :3])


def test_all_five_filters_decode_exactly():
    """Hand-encode a stream cycling None/Sub/Up/Average/Paeth rows."""
    rng = np.random.default_rng(5)
    h, w, ch = 10, 6, 3
    img = rng.integers(0, 256, (h, w, ch), dtype=np.uint8)
    flat = img.reshape(h, w * ch).astype(np.int64)
    rows = bytearray()
    prev = np.zeros(w * ch, np.int64)
    for y in range(h):
        f = y % 5
        cur = flat[y]
        enc = cur.copy()
        if f == 1:
            enc[ch:] = (cur[ch:] - cur[:-ch]) % 256
        elif f == 2:
            enc = (cur - prev) % 256
        elif f == 3:
            for x in range(w * ch):
                a = cur[x - ch] if x >= ch else 0
                enc[x] = (cur[x] - (a + prev[x]) // 2) % 256
        elif f == 4:
            for x in range(w * ch):
                a = cur[x - ch] if x >= ch else 0
                b = prev[x]
                c = prev[x - ch] if x >= ch else 0
                p = a + b - c
                pa_, pb, pc_ = abs(p - a), abs(p - b), abs(p - c)
                pred = a if (pa_ <= pb and pa_ <= pc_) else \
                    (b if pb <= pc_ else c)
                enc[x] = (cur[x] - pred) % 256
        rows += bytes([f]) + bytes(enc.astype(np.uint8).tolist())
        prev = cur
    assert np.array_equal(decode_png(_png(w, h, 2, bytes(rows))), img)


def test_palette_stream():
    rng = np.random.default_rng(6)
    pal = rng.integers(0, 256, (16, 3), dtype=np.uint8)
    idx = rng.integers(0, 16, (10, 12), dtype=np.uint8)
    rows = b"".join(bytes([0]) + bytes(idx[y].tolist())
                    for y in range(10))
    payload = _png(12, 10, 3, rows, extra=_chunk(b"PLTE", pal.tobytes()))
    assert np.array_equal(decode_png(payload), pal[idx])


def test_rejects_unsupported():
    with pytest.raises(ValueError, match="signature"):
        decode_png(b"nope")
    bad_depth = b"\x89PNG\r\n\x1a\n" + _chunk(
        b"IHDR", struct.pack(">IIBBBBB", 4, 4, 16, 2, 0, 0, 0))
    with pytest.raises(ValueError, match="bit depth"):
        decode_png(bad_depth)
    interlaced = b"\x89PNG\r\n\x1a\n" + _chunk(
        b"IHDR", struct.pack(">IIBBBBB", 4, 4, 8, 2, 0, 0, 1))
    with pytest.raises(ValueError, match="interlace"):
        decode_png(interlaced)


def test_sniffer_and_decoder_wiring():
    from pyschema_ray.functions.codecs import sniff_format
    from pyschema_ray.functions.multimodal import ImageDecoder

    rng = np.random.default_rng(8)
    img = rng.integers(0, 256, (20, 28, 3), dtype=np.uint8)
    payload = encode_png(img)
    assert sniff_format(payload) == "png"
    dec = ImageDecoder(height=8, width=8)
    t = pa.table({"media_id": pa.array(["p"], pa.string()),
                  "payload": pa.array([payload], pa.binary())})
    out = dec(t)
    assert len(out["image_features"][0].as_py()) == 8


def test_media_table_includes_png(ray_session):
    from pyschema_ray.functions.multimodal import synth_real_media_table
    tbl = synth_real_media_table(24)
    assert "png" in set(tbl["format"].to_pylist())
