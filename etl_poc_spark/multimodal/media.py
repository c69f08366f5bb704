"""Multimodal (binary) column plumbing.

Design: image/audio/video are opaque `binary` columns (from
`spark.read.format("binaryFile")` or any table with BinaryType) with typed
metadata structs produced by Arrow-batched pandas UDFs over mapInPandas.

The decode kernels themselves are STUBBED — this container ships no
image/audio libraries — but the Spark-side contract is real and tested:
schemas, batch shapes, partitioning behavior, and the dispatch seam where
PIL/ffmpeg would slot in. `strict=True` raises NotImplementedError at the
decode seam; the default deterministic fake derives metadata from the raw
bytes so pipelines (and tests) can run end-to-end.

Scale notes: binaryFile scans parallelize per-file; keep
`spark.sql.files.maxPartitionBytes` sized so a partition's worth of media
fits executor memory, and always project metadata early so downstream
stages never shuffle raw bytes.
"""

from __future__ import annotations

import hashlib
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

MEDIA_META_SCHEMA = T.StructType(
    [
        T.StructField("path", T.StringType()),
        T.StructField("n_bytes", T.LongType()),
        T.StructField("content_hash", T.StringType()),
        T.StructField("format", T.StringType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
    ]
)


def read_binary_dir(spark: SparkSession, path: str, glob: str | None = None) -> DataFrame:
    reader = spark.read.format("binaryFile")
    if glob:
        reader = reader.option("pathGlobFilter", glob)
    return reader.load(path)


def _sniff_format(data: bytes) -> str:
    if data[:8] == b"\x89PNG\r\n\x1a\n":
        return "png"
    if data[:3] == b"\xff\xd8\xff":
        return "jpeg"
    if data[:4] == b"RIFF" and data[8:12] == b"WAVE":
        return "wav"
    return "unknown"


def _decode_dims(data: bytes, strict: bool) -> tuple[int, int]:
    """The real-decoder seam. A deployment wires PIL/ffmpeg here; the stub
    derives deterministic fake dimensions from the content hash."""
    if strict:
        raise NotImplementedError(
            "real media decoding requires an image/audio library not present "
            "in this environment; install one and replace _decode_dims"
        )
    h = hashlib.md5(data).digest()
    return 64 + h[0] % 192, 64 + h[1] % 192


def decode_image_meta(df: DataFrame, content_col: str = "content", path_col: str = "path",
                      strict: bool = False) -> DataFrame:
    """binary column -> typed metadata struct columns via mapInPandas."""

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for _, row in pdf.iterrows():
                data = bytes(row[content_col])
                w, h = _decode_dims(data, strict)
                rows.append(
                    {
                        "path": str(row[path_col]),
                        "n_bytes": len(data),
                        "content_hash": hashlib.md5(data).hexdigest(),
                        "format": _sniff_format(data),
                        "width": w,
                        "height": h,
                    }
                )
            yield pd.DataFrame(rows, columns=[f.name for f in MEDIA_META_SCHEMA.fields])

    return df.select(path_col, content_col).mapInPandas(fn, schema=MEDIA_META_SCHEMA)


def resize_image_stub(df: DataFrame, target_w: int = 64, target_h: int = 64,
                      content_col: str = "content", path_col: str = "path") -> DataFrame:
    """Resize contract: binary in -> binary out + dims. The interpolation
    kernel is the stubbed seam (a real deployment calls PIL here); the stub
    emits a deterministic `target_w*target_h`-byte payload derived from the
    source hash so downstream size/shape invariants are testable."""

    out_schema = T.StructType(
        [
            T.StructField("path", T.StringType()),
            T.StructField("width", T.IntegerType()),
            T.StructField("height", T.IntegerType()),
            T.StructField("resized", T.BinaryType()),
        ]
    )

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        n = target_w * target_h
        for pdf in batches:
            rows = []
            for _, row in pdf.iterrows():
                data = bytes(row[content_col])
                seed = hashlib.md5(data).digest()
                payload = (seed * (n // len(seed) + 1))[:n]
                rows.append({"path": str(row[path_col]), "width": target_w, "height": target_h, "resized": payload})
            yield pd.DataFrame(rows, columns=[f.name for f in out_schema.fields])

    return df.select(path_col, content_col).mapInPandas(fn, schema=out_schema)


def feature_extract_stub(df: DataFrame, dim: int = 64,
                         content_col: str = "content", path_col: str = "path") -> DataFrame:
    """Feature extraction contract: binary -> embedding array<float>. The
    model forward-pass is the stubbed seam; the stub derives a deterministic
    unit-scale vector from md5 rounds over the content, producing the same
    (id, embedding) shape the similarity operators consume — so
    media -> features -> cosine top-k pipelines are testable end to end."""

    out_schema = T.StructType(
        [
            T.StructField("path", T.StringType()),
            T.StructField("embedding", T.ArrayType(T.FloatType())),
        ]
    )

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for _, row in pdf.iterrows():
                data = bytes(row[content_col])
                vals: list[float] = []
                seed = data
                while len(vals) < dim:
                    seed = hashlib.md5(seed).digest()
                    vals.extend(b / 255.0 - 0.5 for b in seed)
                rows.append({"path": str(row[path_col]), "embedding": vals[:dim]})
            yield pd.DataFrame(rows, columns=[f.name for f in out_schema.fields])

    return df.select(path_col, content_col).mapInPandas(fn, schema=out_schema)


def frame_sample_stub(df: DataFrame, every_n: int = 10) -> DataFrame:
    """Video frame-sampling contract: one row per sampled frame index.
    Frame count is stubbed as n_bytes // 1024 (a real decoder reports it);
    the fan-out shape (posexplode over a sequence) is the real plumbing."""
    from pyspark.sql import functions as F

    n_frames = (F.length(F.col("content")) / F.lit(1024)).cast("int")
    idx = F.sequence(F.lit(0), F.greatest(n_frames - 1, F.lit(0)), F.lit(every_n))
    return (
        df.withColumn("__n_frames", n_frames)
        .filter(F.col("__n_frames") > 0)
        .select("path", F.posexplode(idx).alias("sample_idx", "frame_idx"))
    )


from etl_poc_spark._serde import register_by_value as _rbv  # noqa: E402

_rbv(__name__)
