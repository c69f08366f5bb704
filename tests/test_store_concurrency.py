"""Write-concurrency contract of the incremental delta-log stores
(r12 verdict ask #2).

The stores (ngram_lm, dsir, exact-dedup, line-dedup) are append-only
delta logs with tag-slotted overwrite for replay idempotency. Their
concurrency contract, stated and pinned here:

- SINGLE WRITER PER TAG. Tags are minted from streaming micro-batch ids,
  which foreachBatch checkpointing serializes — two live writers never
  hold the same tag in the supported topology. A second (sequential)
  write to an existing tag is a REPLAY and must replace the slot exactly:
  last-writer-wins per tag, verified bit-equal below for every store.
- CONCURRENT WRITERS WITH DISTINCT TAGS are safe: each tag is an
  independent directory, and the fold (SUM over deltas) is associative
  and order-free — verified below against a sequential reference.
- Two CONCURRENT writers on the SAME tag are out of contract (Spark's
  overwrite is delete-then-commit; interleaving can mix files), but the
  damage is confined to that one slot and HEALS on the next same-tag
  replay — which is exactly the streaming recovery discipline (restart
  replays the batch). Pinned below for the LM store.
"""

from __future__ import annotations

from concurrent.futures import ThreadPoolExecutor

from pyspark.sql import functions as F


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def _lm_fold(spark, store):
    from etl_poc_spark.operators.ngram_lm import read_bigram_lm_store

    bi, uni, vocab = read_bigram_lm_store(spark, store)
    return (
        {r["bigram"]: r["c_bi"] for r in bi.collect()},
        {r["w1"]: r["c_uni"] for r in uni.collect()},
        vocab.collect()[0]["v"],
    )


def test_lm_store_same_tag_last_writer_wins(spark, tmp_path):
    """Sequential two-writer-same-tag on the bigram-LM store: the second
    write REPLACES the slot (tagged overwrite), so the fold equals a
    store that only ever saw the second batch — bit-equal counts."""
    from etl_poc_spark.operators.ngram_lm import incremental_bigram_lm_ingest

    a = _docs(spark, [(1, "alpha beta gamma"), (2, "alpha beta")])
    b = _docs(spark, [(3, "delta epsilon zeta"), (4, "delta epsilon")])

    raced = str(tmp_path / "raced")
    incremental_bigram_lm_ingest(spark, a, raced, batch_tag="b1")
    incremental_bigram_lm_ingest(spark, b, raced, batch_tag="b1")  # replay/race

    ref = str(tmp_path / "ref")
    incremental_bigram_lm_ingest(spark, b, ref, batch_tag="b1")
    assert _lm_fold(spark, raced) == _lm_fold(spark, ref)


def test_lm_store_concurrent_distinct_tags_fold_is_order_free(spark, tmp_path):
    """Four concurrent writers, four DISTINCT tags: each tag is its own
    directory and the fold is an associative SUM, so the result is
    bit-equal to sequential ingestion of the same batches."""
    from etl_poc_spark.operators.ngram_lm import incremental_bigram_lm_ingest

    batches = [
        _docs(spark, [(10 * i + j, f"tok{i} tok{j} common") for j in range(3)])
        for i in range(4)
    ]
    conc = str(tmp_path / "conc")
    with ThreadPoolExecutor(max_workers=4) as ex:
        list(
            ex.map(
                lambda ib: incremental_bigram_lm_ingest(
                    spark, ib[1], conc, batch_tag=f"b{ib[0]}"
                ),
                enumerate(batches),
            )
        )
    seq = str(tmp_path / "seq")
    for i, b in enumerate(batches):
        incremental_bigram_lm_ingest(spark, b, seq, batch_tag=f"b{i}")
    assert _lm_fold(spark, conc) == _lm_fold(spark, seq)


def test_lm_store_same_tag_damage_heals_on_replay(spark, tmp_path):
    """Concurrent SAME-tag writers are out of contract — but the failure
    is confined to that tag slot, and ONE sequential same-tag replay
    (the streaming restart path) restores exact single-writer state."""
    from etl_poc_spark.operators.ngram_lm import incremental_bigram_lm_ingest

    a = _docs(spark, [(1, "alpha beta gamma")])
    b = _docs(spark, [(2, "delta epsilon zeta")])
    raced = str(tmp_path / "raced")
    incremental_bigram_lm_ingest(spark, _docs(spark, [(0, "seed words here")]),
                                 raced, batch_tag="b0")
    def _try_ingest(d):
        # out-of-contract by design: one concurrent same-tag writer may
        # ERROR (Spark's overwrite is delete-then-commit; the other
        # writer can delete its staging mid-commit). Any outcome —
        # either wins, both partially land, one raises — must heal below.
        try:
            incremental_bigram_lm_ingest(spark, d, raced, batch_tag="b1")
        except Exception:  # noqa: BLE001
            pass

    with ThreadPoolExecutor(max_workers=2) as ex:  # same tag, concurrent
        list(ex.map(_try_ingest, [a, b]))
    # the heal: replay tag b1 once, sequentially (streaming restart)
    incremental_bigram_lm_ingest(spark, b, raced, batch_tag="b1")

    ref = str(tmp_path / "ref")
    incremental_bigram_lm_ingest(spark, _docs(spark, [(0, "seed words here")]),
                                 ref, batch_tag="b0")
    incremental_bigram_lm_ingest(spark, b, ref, batch_tag="b1")
    assert _lm_fold(spark, raced) == _lm_fold(spark, ref)


def test_dsir_store_same_tag_last_writer_wins(spark, tmp_path):
    from etl_poc_spark.operators.dsir import (
        incremental_dsir_ingest,
        read_dsir_store,
    )

    a = _docs(spark, [(1, "alpha beta gamma delta")])
    b = _docs(spark, [(2, "epsilon zeta eta theta")])
    raced = str(tmp_path / "raced")
    incremental_dsir_ingest(spark, a, raced, role="raw", batch_tag="b1")
    incremental_dsir_ingest(spark, b, raced, role="raw", batch_tag="b1")
    ref = str(tmp_path / "ref")
    incremental_dsir_ingest(spark, b, ref, role="raw", batch_tag="b1")

    fold = lambda s: {
        r["bucket"]: r["c"] for r in read_dsir_store(spark, s, "raw").collect()
    }
    assert fold(raced) == fold(ref)


def test_exact_dedup_store_same_tag_last_writer_wins(spark, tmp_path):
    from etl_poc_spark.operators.incremental import (
        incremental_exact_dedup_ingest,
        read_exact_dedup_store,
    )

    a = _docs(spark, [(1, "first text"), (2, "first text")])
    b = _docs(spark, [(3, "second text"), (4, "other text")])
    raced = str(tmp_path / "raced")
    incremental_exact_dedup_ingest(spark, a, raced, ["text"], batch_tag="b1")
    incremental_exact_dedup_ingest(spark, b, raced, ["text"], batch_tag="b1")
    ref = str(tmp_path / "ref")
    incremental_exact_dedup_ingest(spark, b, ref, ["text"], batch_tag="b1")

    fold = lambda s: {
        r["fp"]: (r["min_id"], r["n_copies"])
        for r in read_exact_dedup_store(spark, s).collect()
    }
    assert fold(raced) == fold(ref)


def test_line_dedup_store_same_batch_id_replaces_partition(spark, tmp_path):
    """The line-dedup store keys slots by batch_id with dynamic partition
    overwrite — the same last-writer-wins-per-slot contract, at the
    partition layer instead of a tag directory."""
    from etl_poc_spark.operators.linededup import incremental_line_dedup_ingest

    a = _docs(spark, [(1, " ".join(f"a{k}" for k in range(12)))])
    b = _docs(spark, [(2, " ".join(f"b{k}" for k in range(12)))])
    raced = str(tmp_path / "raced")
    incremental_line_dedup_ingest(spark, a, raced, batch_id=1)
    incremental_line_dedup_ingest(spark, b, raced, batch_id=1)
    ref = str(tmp_path / "ref")
    incremental_line_dedup_ingest(spark, b, ref, batch_id=1)

    fold = lambda s: {
        r["seg_hash"]: r["n_docs"] for r in spark.read.parquet(s).collect()
    }
    assert fold(raced) == fold(ref)
