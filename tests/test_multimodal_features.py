"""Multimodal image kernels: real stdlib decode/resize/features, plus the
deterministic fallback for undecodable formats, through the mapInPandas
media operators into the similarity operator end to end."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from etl_poc_spark.multimodal.imagecodec import (
    decode_bmp,
    decode_png,
    decode_ppm,
    encode_bmp,
    encode_png,
    encode_ppm,
    luminance_histogram,
    resize_nearest,
)
from etl_poc_spark.multimodal.media import feature_extract, read_binary_dir, resize_image
from etl_poc_spark.operators.similarity import cosine_topk


def _gradient_rgb(w: int, h: int) -> bytes:
    return bytes(
        v
        for y in range(h)
        for x in range(w)
        for v in ((x * 255) // max(w - 1, 1), (y * 255) // max(h - 1, 1), (x + y) % 256)
    )


def test_codec_roundtrips():
    w, h = 13, 9
    rgb = _gradient_rgb(w, h)
    assert decode_ppm(encode_ppm(w, h, rgb)) == (w, h, rgb)
    assert decode_bmp(encode_bmp(w, h, rgb)) == (w, h, rgb)
    assert decode_png(encode_png(w, h, rgb)) == (w, h, rgb)


def test_png_filters_decode():
    # zlib-compressed scanlines with each filter type, built by hand: encode
    # a 4x4 with filter 0 via encode_png, then spot-check a Sub-filtered row
    import struct
    import zlib

    w = h = 4
    rgb = _gradient_rgb(w, h)
    stride = w * 3
    rows = []
    for r in range(h):
        line = bytearray(rgb[r * stride : (r + 1) * stride])
        if r % 2 == 1:  # filter 1 (Sub): delta-encode against left pixel
            for i in range(stride - 1, 2, -1):
                line[i] = (line[i] - line[i - 3]) & 0xFF
            rows.append(b"\x01" + bytes(line))
        else:
            rows.append(b"\x00" + bytes(line))
    raw = b"".join(rows)

    def chunk(ctype, body):
        crc = zlib.crc32(ctype + body) & 0xFFFFFFFF
        return struct.pack(">I", len(body)) + ctype + body + struct.pack(">I", crc)

    data = (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0))
        + chunk(b"IDAT", zlib.compress(raw))
        + chunk(b"IEND", b"")
    )
    assert decode_png(data) == (w, h, rgb)


def test_resize_nearest_pixel_exact():
    # 2x2 distinct-color image scaled to 4x4: each source pixel becomes a
    # 2x2 block (nearest neighbor, exact expected bytes)
    px = {"R": (255, 0, 0), "G": (0, 255, 0), "B": (0, 0, 255), "W": (255, 255, 255)}
    rgb = bytes(v for k in ("R", "G", "B", "W") for v in px[k])
    out = resize_nearest(2, 2, rgb, 4, 4)
    grid = [["RRGG", "RRGG", "BBWW", "BBWW"][y][x] for y in range(4) for x in range(4)]
    expected = bytes(v for k in grid for v in px[k])
    assert out == expected
    # downscale back picks the top-left of each block
    assert resize_nearest(4, 4, out, 2, 2) == rgb


def test_luminance_histogram_properties():
    black_white = bytes((0, 0, 0)) * 3 + bytes((255, 255, 255))
    hist = luminance_histogram(black_white, bins=4)
    assert hist[0] == 0.75 and hist[3] == 0.25 and sum(hist) == 1.0


def _write_real_media(tmp_path):
    """Six distinct real images + the SAME pixels as img0 in a different
    container format (PNG vs BMP) — a true near-duplicate."""
    for i in range(6):
        rgb = bytes((p * (i + 3) + i) % 256 for p in range(20 * 10 * 3))
        (tmp_path / f"img{i}.png").write_bytes(encode_png(20, 10, rgb))
        if i == 0:
            (tmp_path / "img0_copy.bmp").write_bytes(encode_bmp(20, 10, rgb))
    return str(tmp_path)


def test_resize_contract_real_decode(spark, tmp_path):
    d = _write_real_media(tmp_path)
    df = read_binary_dir(spark, d)
    out = resize_image(df, target_w=8, target_h=4).collect()
    assert len(out) == 7
    for r in out:
        assert (r["width"], r["height"]) == (8, 4)
        assert len(r["resized"]) == 8 * 4 * 3  # RGB shape invariant
        assert r["decoded"]  # every input was a real PPM/BMP/PNG
    # same pixels in different containers -> identical resized bytes
    by_name = {r["path"].rsplit("/", 1)[-1]: bytes(r["resized"]) for r in out}
    assert by_name["img0.png"] == by_name["img0_copy.bmp"]


def test_feature_extract_to_similarity_real_decode(spark, tmp_path):
    d = _write_real_media(tmp_path)
    df = read_binary_dir(spark, d)
    feats = feature_extract(df, dim=32).withColumn("vec_id", F.abs(F.xxhash64("path")))
    assert feats.select(F.size("embedding")).distinct().collect()[0][0] == 32
    assert all(r["decoded"] for r in feats.select("decoded").collect())
    # identical pixels (different container format) -> identical histogram
    # -> cosine 1.0 via the similarity operator over media-derived features
    target = feats.filter(F.col("path").endswith("img0.png"))
    base = feats.filter(~F.col("path").endswith("/img0.png"))
    top = cosine_topk(target, base, k=1).collect()[0]
    assert top["cos_sim"] == 1.0  # the BMP re-encode is the nearest neighbor


def test_undecodable_fallback_is_deterministic(spark, tmp_path):
    (tmp_path / "x.jpg").write_bytes(b"\xff\xd8\xff\xe0" + b"\x07" * 500)
    (tmp_path / "y.jpg").write_bytes(b"\xff\xd8\xff\xe0" + b"\x07" * 500)
    df = read_binary_dir(spark, str(tmp_path))
    out = resize_image(df, target_w=4, target_h=4).collect()
    assert all(not r["decoded"] for r in out)
    payloads = {bytes(r["resized"]) for r in out}
    assert len(payloads) == 1  # same bytes -> same fallback payload
    assert len(payloads.pop()) == 4 * 4 * 3
    with pytest.raises(Exception, match="NotImplementedError|image library"):
        resize_image(df, strict=True).collect()


def test_corrupt_images_fall_back_not_crash(spark, tmp_path):
    """Truncated/corrupt files raise zlib.error / struct.error inside the
    codecs — they must fall back (decoded=False), never kill the task."""
    good = encode_png(6, 4, _gradient_rgb(6, 4))
    (tmp_path / "trunc_idat.png").write_bytes(good[: len(good) - 20])  # cut mid-IDAT/IEND
    (tmp_path / "cut_ihdr.png").write_bytes(good[:20])                 # cut inside IHDR
    (tmp_path / "bad.bmp").write_bytes(b"BM" + b"\x00" * 80)           # nonsense BMP header
    (tmp_path / "ok.png").write_bytes(good)
    df = read_binary_dir(spark, str(tmp_path))
    out = {r["path"].rsplit("/", 1)[-1]: r for r in resize_image(df, 4, 4).collect()}
    assert len(out) == 4  # no task failure
    assert out["ok.png"]["decoded"]
    for name in ("trunc_idat.png", "cut_ihdr.png", "bad.bmp"):
        assert not out[name]["decoded"]
        assert len(out[name]["resized"]) == 4 * 4 * 3  # fallback keeps the shape
