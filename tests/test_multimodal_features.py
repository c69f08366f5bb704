"""Multimodal resize / feature-extract stubs: media -> features -> similarity
pipelines end to end (the plumbing is real, the kernels are stubbed seams)."""

from __future__ import annotations

from pyspark.sql import functions as F

from etl_poc_spark.multimodal.media import feature_extract_stub, read_binary_dir, resize_image_stub
from etl_poc_spark.operators.similarity import cosine_topk


def _write_fake_media(tmp_path, n=6):
    for i in range(n):
        (tmp_path / f"img{i}.png").write_bytes(b"\x89PNG\r\n\x1a\n" + bytes([i]) * (2000 + i * 100))
    # a near-duplicate of img0 (same payload)
    (tmp_path / "img0_copy.png").write_bytes(b"\x89PNG\r\n\x1a\n" + bytes([0]) * 2000)
    return str(tmp_path)


def test_resize_contract(spark, tmp_path):
    d = _write_fake_media(tmp_path)
    df = read_binary_dir(spark, d)
    out = resize_image_stub(df, target_w=32, target_h=16).collect()
    assert len(out) == 7
    for r in out:
        assert (r["width"], r["height"]) == (32, 16)
        assert len(r["resized"]) == 32 * 16  # shape invariant holds
    # deterministic: same source bytes -> same resized payload
    by_name = {r["path"].rsplit("/", 1)[-1]: bytes(r["resized"]) for r in out}
    assert by_name["img0.png"] == by_name["img0_copy.png"]


def test_feature_extract_to_similarity(spark, tmp_path):
    d = _write_fake_media(tmp_path)
    df = read_binary_dir(spark, d)
    feats = feature_extract_stub(df, dim=32).withColumn(
        "vec_id", F.abs(F.xxhash64("path"))
    )
    assert feats.select(F.size("embedding")).distinct().collect()[0][0] == 32
    # identical content -> identical embedding -> cosine 1.0 via the
    # similarity operator consuming media-derived features
    target = feats.filter(F.col("path").endswith("img0.png"))
    base = feats.filter(~F.col("path").endswith("/img0.png"))
    top = cosine_topk(target, base, k=1).collect()[0]
    assert top["cos_sim"] == 1.0  # the copy is the nearest neighbor
