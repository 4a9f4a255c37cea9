"""Pure-numpy baseline JPEG codec (functions/jpeg.py): round-trip
accuracy, subsampling, restart markers, greyscale, odd sizes, and the
multimodal wiring."""
import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pytest

from pyschema_ray.functions.jpeg import decode_jpeg, encode_jpeg


def _gradient(h=40, w=56, seed=7):
    rng = np.random.default_rng(seed)
    yy, xx = np.mgrid[0:h, 0:w]
    img = np.stack([(yy * 255 / h), (xx * 255 / w),
                    ((yy + xx) * 255 / (h + w))], axis=-1)
    return np.clip(img + rng.normal(0, 2, img.shape), 0,
                   255).astype(np.uint8)


@pytest.mark.parametrize("quality,sub,tol_max,tol_mean", [
    (95, "444", 12, 2.5), (85, "444", 14, 3.0), (85, "420", 20, 4.0),
])
def test_round_trip_accuracy(quality, sub, tol_max, tol_mean):
    img = _gradient()
    out = decode_jpeg(encode_jpeg(img, quality, sub))
    assert out.shape == img.shape and out.dtype == np.uint8
    err = np.abs(out.astype(np.int64) - img.astype(np.int64))
    assert err.max() <= tol_max and err.mean() <= tol_mean


def test_flat_color_near_exact():
    flat = np.full((16, 24, 3), 130, np.uint8)
    out = decode_jpeg(encode_jpeg(flat, 90))
    assert np.abs(out.astype(np.int64) - 130).max() <= 1


def test_greyscale_round_trip():
    g = np.tile(np.arange(56, dtype=np.uint8) * 4, (24, 1))
    out = decode_jpeg(encode_jpeg(g, 92))
    assert out.shape == g.shape
    assert np.abs(out.astype(np.int64) - g.astype(np.int64)).max() <= 4


def test_odd_dimensions_all_subsamplings():
    img = _gradient(33, 41)
    for sub in ("444", "420"):
        out = decode_jpeg(encode_jpeg(img, 85, sub))
        assert out.shape == (33, 41, 3)


def test_restart_markers_bit_identical():
    img = _gradient()
    base = decode_jpeg(encode_jpeg(img, 85, "420"))
    for ri in (1, 3):
        out = decode_jpeg(encode_jpeg(img, 85, "420",
                                      restart_interval=ri))
        assert np.array_equal(out, base)


def test_rejects_progressive_and_garbage():
    img = _gradient(16, 16)
    payload = bytearray(encode_jpeg(img, 85))
    sof = payload.find(b"\xff\xc0")
    payload[sof + 1] = 0xC2  # rewrite SOF0 -> SOF2 (progressive)
    with pytest.raises(ValueError, match="SOF"):
        decode_jpeg(bytes(payload))
    with pytest.raises(ValueError, match="SOI"):
        decode_jpeg(b"not a jpeg")


def test_sniffer_and_image_decoder_wiring():
    from pyschema_ray.functions.codecs import (image_features,
                                               resize_nearest,
                                               sniff_format)
    from pyschema_ray.functions.multimodal import ImageDecoder

    img = _gradient(20, 28)
    payload = encode_jpeg(img, 95)
    assert sniff_format(payload) == "jpeg"

    dec = ImageDecoder(height=16, width=16)
    t = pa.table({"media_id": pa.array(["a"], pa.string()),
                  "payload": pa.array([payload], pa.binary())})
    out = dec(t)
    got = np.asarray(out["image_features"][0].as_py(), np.float32)
    want = image_features(resize_nearest(img, 16, 16))
    # decode is lossy, so features are close, not equal
    assert np.allclose(got, want, atol=3.0)


def test_media_table_includes_real_jpeg(ray_session):
    import ray.data
    from pyschema_ray.functions.multimodal import (decode_images,
                                                   synth_real_media_table)
    tbl = synth_real_media_table(20)
    fmts = set(tbl["format"].to_pylist())
    assert "jpeg" in fmts
    imgs = ray.data.from_arrow(tbl.filter(
        pc.equal(tbl["media_type"], "image")))
    feats = decode_images(imgs, height=8, width=8, concurrency=2)
    out = feats.to_pandas()
    assert len(out) == tbl.filter(
        pc.equal(tbl["media_type"], "image")).num_rows
