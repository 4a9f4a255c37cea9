"""GIF codec: LZW round-trips (incl. interlace + 256-color palettes),
sniffer wiring, actor-stage decode path."""

import numpy as np
import pyarrow as pa
import pytest

import ray

from pyschema_ray.functions import codecs
from pyschema_ray.functions.gif import decode_gif, encode_gif


def _img(h=37, w=23, k=5, seed=1):
    rng = np.random.default_rng(seed)
    pal = rng.integers(0, 256, (k, 3), dtype=np.uint8)
    return pal[rng.integers(0, k, (h, w))]


def test_gif_roundtrip_plain_and_interlaced():
    img = _img()
    for inter in (False, True):
        back = decode_gif(encode_gif(img, interlace=inter))
        assert back.dtype == np.uint8 and (back == img).all(), inter


def test_gif_roundtrip_full_palette_and_tiny():
    rng = np.random.default_rng(3)
    pal = np.array([[i, 255 - i, (i * 7) % 256] for i in range(256)],
                   np.uint8)
    img = pal[rng.integers(0, 256, (64, 64))]
    assert (decode_gif(encode_gif(img)) == img).all()
    tiny = np.zeros((3, 3, 3), np.uint8)
    tiny[1, 1] = [255, 0, 0]
    assert (decode_gif(encode_gif(tiny)) == tiny).all()


def test_gif_too_many_colors_rejected():
    rng = np.random.default_rng(2)
    big = rng.integers(0, 256, (30, 30, 3), dtype=np.uint8)
    assert len(np.unique(big.reshape(-1, 3), axis=0)) > 256
    with pytest.raises(ValueError):
        encode_gif(big)


def test_gif_sniffed_and_89a_extensions_skipped():
    img = _img(8, 8, 3)
    payload = encode_gif(img)
    assert codecs.sniff_format(payload) == "gif"
    # splice an 89a graphic-control extension in front of the image
    # descriptor: decoder must skip it
    body = bytearray(payload)
    assert body[:6] == b"GIF87a"
    body[:6] = b"GIF89a"
    idesc = payload.index(b"\x2c")
    ext = b"\x21\xf9\x04\x00\x00\x00\x00\x00"
    spliced = bytes(body[:idesc]) + ext + bytes(body[idesc:])
    assert (decode_gif(spliced) == img).all()


def test_gif_through_image_decoder_stage():
    from pyschema_ray.functions.multimodal import ImageDecoder

    img = _img(16, 16, 4)
    t = pa.table({"payload": pa.array([encode_gif(img)], pa.binary())})
    dec = ImageDecoder(height=8, width=8)
    out = dec(t)
    feats = out["features"][0].as_py() if "features" in out.column_names \
        else out.column(out.num_columns - 1)[0].as_py()
    assert feats is not None and len(feats) > 0
