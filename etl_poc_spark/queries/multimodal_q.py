"""Multimodal dedup queries: perceptual-hash image near-dup search.

The testdata ships no image files, so the query leg renders a REAL image
per document — the text bytes become the pixel payload of a 16x16 PPM —
and then runs the full production path: stdlib decode -> aHash/dHash
(multimodal/imagecodec.py) -> 4x16-bit banded self-join -> bit_count
Hamming verify (operators/dedup.py:simhash64_near_dup_pairs). Exact-dup
documents render byte-identical images (Hamming 0); near-dup documents
with aligned edits render near-dup images.

Not SQL-expressible in DuckDB (byte-level image decode + integer luma
math), so these are rows-only for the driver gate; the bit-exact checks
live in tests/test_multimodal_features.py property tests instead.

Reference parity: parhampr/ETL-POC treats media as opaque payloads and has
no image dedup; this is the training-data-curation extension of the dedup
stack (same banding geometry as queries/dedup2_q.py).
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from etl_poc_spark.io import load_table
from etl_poc_spark.multimodal import imagecodec
from etl_poc_spark.multimodal.media import image_near_dup_pairs, perceptual_hashes
from etl_poc_spark.registry import query

_IMG_W = 16
_IMG_H = 16
_PAYLOAD = _IMG_W * _IMG_H * imagecodec.RGB_BPP

_RENDER_SCHEMA = T.StructType(
    [
        T.StructField("path", T.StringType()),
        T.StructField("content", T.BinaryType()),
    ]
)


def render_document_images(docs: DataFrame) -> DataFrame:
    """(doc_id, text) -> (path, content) where content is a valid 16x16 P6
    PPM whose pixel bytes are the document's UTF-8 bytes zero-padded (or
    truncated) to 768. Deterministic; paths are zero-padded doc_ids so
    lexicographic id_a < id_b ordering matches numeric order downstream."""

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, text in zip(pdf["doc_id"], pdf["text"]):
                raw = str(text).encode("utf-8")[:_PAYLOAD]
                payload = raw + b"\x00" * (_PAYLOAD - len(raw))
                rows.append(
                    {
                        "path": "%012d" % int(doc_id),
                        "content": imagecodec.encode_ppm(_IMG_W, _IMG_H, payload),
                    }
                )
            yield pd.DataFrame(rows, columns=["path", "content"])

    return docs.select("doc_id", "text").mapInPandas(fn, schema=_RENDER_SCHEMA)


@query("image_near_dup_pairs")  # rows-only: image decode is not SQL-expressible
def image_near_dup_pairs_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Image near-duplicate pairs over document-rendered PPMs: real decode,
    dHash, banded self-join, Hamming <= 3 verify."""
    docs = load_table(spark, sf_dir, "documents")
    imgs = render_document_images(docs)
    pairs = image_near_dup_pairs(imgs, hash_col="dhash", max_hamming=3, max_bucket_size=200)
    return pairs.select(
        F.col("id_a").cast("long").alias("id_a"),
        F.col("id_b").cast("long").alias("id_b"),
        F.col("hamming").cast("int").alias("hamming"),
    )


@query("image_phash_stats")  # rows-only: same non-SQL decode path
def image_phash_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-level perceptual-hash summary: decode rate and distinct-hash
    counts — the 'how much image-level duplication' dashboard number."""
    docs = load_table(spark, sf_dir, "documents")
    hashes = perceptual_hashes(render_document_images(docs))
    return hashes.agg(
        F.count(F.lit(1)).alias("n_images"),
        F.sum(F.col("decoded").cast("int")).alias("n_decoded"),
        F.countDistinct("ahash").alias("distinct_ahash"),
        F.countDistinct("dhash").alias("distinct_dhash"),
    )
