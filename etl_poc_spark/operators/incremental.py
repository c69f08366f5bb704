"""Incremental near-dup ingestion: dedup a NEW batch against a persisted
LSH band store, then fold the survivors into the store.

The production shape for continuous corpus growth (the reference ingests
arXiv batches daily — zara_hybrid_etl.py's idempotent download loop — but
dedups only within a run; this closes that gap Spark-first):

- the store holds only (band, band_val, id) rows — a few hundred bytes per
  document regardless of body size; band/band_val are DATA columns (r16:
  previously band was a write partition dir, which the compaction-aware
  recursive read cannot preserve — the probe is an equi-join on the full
  (band, band_val) key, so directory pruning never fired anyway);
- an incoming batch NEVER joins against historical bodies: batch bands
  semi/anti-join the store on (band, band_val), so history participates
  as an equi-join build side of signature rows only;
- batch-internal near-dups collapse via the existing pair search +
  connected components (representative = min id);
- surviving documents append their bands to the store — the loop is
  idempotent at the band level: re-ingesting an already-stored batch drops
  every row as a store hit.

LSH decision rule: sharing >= 1 full band is the near-dup verdict (the
standard banding guarantee — for docs above the jaccard threshold the
miss probability is (1 - s^r)^b). Body-level jaccard verification against
HISTORY is intentionally not offered: it would require retaining shingle
sets for the whole corpus, which is exactly what the band store avoids.
"""

from __future__ import annotations

from pyspark.errors import AnalysisException
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from etl_poc_spark.operators.dedup import (
    connected_components,
    lsh_band_signatures,
    lsh_candidate_pairs,
    minhash_signatures,
    shingle_docs,
)


def batch_band_signatures(
    batch: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_hashes: int = 8,
    rows_per_band: int = 2,
    hash_mode: str = "xxhash64",
) -> DataFrame:
    """(id, band, band_val) LSH band signatures for a document batch."""
    sh = shingle_docs(batch, id_col, text_col)
    sigs = minhash_signatures(sh, id_col, n_hashes=n_hashes, hash_mode=hash_mode)
    return lsh_band_signatures(sigs, id_col, rows_per_band).select(
        F.col(id_col), "band", F.col("band_val").cast("string").alias("band_val")
    )


def incremental_near_dup_ingest(
    spark: SparkSession,
    batch: DataFrame,
    store_dir: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_hashes: int = 8,
    rows_per_band: int = 2,
    hash_mode: str = "xxhash64",
    max_bucket_size: int | None = 200,
    batch_id: int | None = None,
) -> DataFrame:
    """Ingest `batch` against the band store at `store_dir`; returns the
    kept (novel, batch-deduped) rows of `batch` and appends their bands to
    the store. See module docstring for the decision rule and scale shape.

    `batch_id` (the streaming seam, same protocol as
    incremental_line_dedup_ingest): when set, the store rows write
    PARTITIONED by batch_id with dynamic partition overwrite and the
    history read EXCLUDES the current batch_id — a replayed micro-batch
    overwrites its own partition instead of double-appending, and never
    sees its prior attempt's bands as history (which would drop every
    row as a self-hit and lose the batch's kept output)."""
    from etl_poc_spark.operators.deltastore import read_delta_store

    bands = batch_band_signatures(
        batch, id_col, text_col, n_hashes, rows_per_band, hash_mode
    )
    try:
        # compaction-aware read (operators/deltastore.py); slot-level
        # replay exclusion, and a batch_id replay against a loose-append
        # store raises DeltaStoreModeError instead of silently counting
        # the prior attempt's bands as history (ADVICE r15)
        store = read_delta_store(
            spark, store_dir,
            exclude_slot=(
                f"batch_id={int(batch_id)}" if batch_id is not None else None
            ),
        )
        have_store = True
    except AnalysisException as exc:
        # first ingest only: the store path does not exist yet. Any OTHER
        # analysis failure (corrupt footer, schema mismatch) must surface —
        # treating it as "no history" would silently dedup against nothing.
        if "PATH_NOT_FOUND" not in str(exc) and "Path does not exist" not in str(exc):
            raise
        have_store = False
    if have_store:
        # ids sharing >= 1 full band with history are near-dups of history
        hit_ids = (
            bands.join(store, ["band", "band_val"], "left_semi")
            .select(id_col)
            .distinct()
        )
        batch = batch.join(hit_ids, id_col, "left_anti")
        bands = bands.join(hit_ids, id_col, "left_anti")
    # collapse near-dup groups WITHIN the surviving batch: keep min id
    sh = shingle_docs(batch, id_col, text_col)
    sigs = minhash_signatures(sh, id_col, n_hashes=n_hashes, hash_mode=hash_mode)
    pairs = lsh_candidate_pairs(
        sigs, id_col, rows_per_band, max_bucket_size=max_bucket_size
    )
    comps = connected_components(pairs)
    drop_ids = (
        comps.filter(F.col("id") != F.col("component"))
        .select(F.col("id").alias(id_col))
    )
    # MATERIALIZE before appending to the store: the kept/kept_bands plans
    # reference the store parquet through hit_ids, and Spark lists parquet
    # files at ACTION time — without this, an action on the returned frame
    # after the append would see the batch's own bands in the store and
    # drop every row as a self-hit
    kept = batch.join(drop_ids, id_col, "left_anti").localCheckpoint(eager=True)
    kept_bands = bands.join(drop_ids, id_col, "left_anti").localCheckpoint(eager=True)
    # documents too short to shingle produce no bands: they can never be
    # caught by the store filter, so they pass through (documented; exact
    # dedup upstream is the right guard for tiny docs)
    if batch_id is None:
        kept_bands.write.mode("append").parquet(store_dir)
    else:
        (
            kept_bands.withColumn("batch_id", F.lit(int(batch_id)))
            .write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("batch_id")
            .parquet(store_dir)
        )
    return kept


def compact_near_dup_store(spark: SparkSession, store_dir: str, **kwargs) -> dict:
    """Fold the band store's old batch_id slots into one consolidated
    slot (operators/deltastore.py protocol, SET fold: the postings carry
    no counts, so consolidation is DISTINCT over (band, band_val, id) —
    every reader is a semi-join, for which duplicates were already
    invisible, hence reads are bit-equal before/after). keep_slots
    (default 1) protects the in-flight micro-batch's replay exclusion.

    Note the id column is whatever the ingest's id_col was; the store
    schema is discovered from the slots themselves (key_cols = all
    columns minus none — DISTINCT over the full row)."""
    from etl_poc_spark.operators.deltastore import (
        compact_delta_store,
        read_delta_store,
    )

    cols = read_delta_store(spark, store_dir).columns
    return compact_delta_store(
        spark, store_dir, key_cols=list(cols), agg=[], **kwargs
    )


def streaming_near_dup_ingest(
    stream: DataFrame,
    store_dir: str,
    kept_dir: str,
    checkpoint_dir: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    **ingest_kwargs,
):
    """Continuous ingestion: each micro-batch runs the same
    incremental_near_dup_ingest against the shared band store and appends
    its survivors to `kept_dir`. Returns a configured DataStreamWriter —
    call .trigger(...).start() to run.

    foreachBatch is the right seam: the dedup decision needs the batch as
    a finite frame (self-pairs + store anti-join), which pure streaming
    operators can't express. foreachBatch delivery is AT-LEAST-ONCE — a
    batch interrupted mid-write replays on restart — so both side effects
    are keyed by batch_id with dynamic partition overwrite (the same
    protocol as streaming_line_dedup_ingest): the replay overwrites its
    own store and kept partitions rather than double-appending, and the
    store read excludes the current batch_id so the replayed batch never
    self-hits. Read kept via spark.read.parquet(kept_dir) — batch_id is
    an inferred partition column."""

    def handle(batch_df: DataFrame, batch_id: int) -> None:
        kept = incremental_near_dup_ingest(
            batch_df.sparkSession, batch_df, store_dir,
            id_col=id_col, text_col=text_col, batch_id=batch_id,
            **ingest_kwargs,
        )
        (
            kept.withColumn("batch_id", F.lit(int(batch_id)))
            .write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("batch_id")
            .parquet(kept_dir)
        )

    return stream.writeStream.foreachBatch(handle).option(
        "checkpointLocation", checkpoint_dir
    )


# --- EXACT dedup: the incremental + streaming twins (near-dup has all
# three above; this completes the triple for the exact-fingerprint path) ---


def exact_fingerprints(
    batch: DataFrame,
    key_cols: list[str],
    id_col: str = "doc_id",
    hash_mode: str = "xxhash64",
) -> DataFrame:
    """(fp, id) content fingerprints: one hash over the concatenated key
    columns (NULL-safe via a reserved separator). md5 mode is the
    oracle-portable string path; xxhash64 the production 64-bit path."""
    sep = F.lit("\x1f")
    parts: list[F.Column] = []
    for c in key_cols:
        parts += [F.coalesce(F.col(c).cast("string"), F.lit("\x00")), sep]
    salted = F.concat(*parts[:-1]) if len(parts) > 1 else parts[0]
    if hash_mode == "md5":
        fp = F.md5(salted)
    elif hash_mode == "xxhash64":
        fp = F.xxhash64(salted).cast("string")
    else:
        raise ValueError(f"unknown hash_mode {hash_mode!r}")
    return batch.select(fp.alias("fp"), F.col(id_col).alias("id"))


def incremental_exact_dedup_ingest(
    spark: SparkSession,
    batch: DataFrame,
    store_dir: str,
    key_cols: list[str],
    id_col: str = "doc_id",
    hash_mode: str = "xxhash64",
    batch_tag: str | None = None,
) -> DataFrame:
    """Dedup `batch` against the exact-fingerprint store, append the
    batch's per-fingerprint delta, and return the kept rows (one
    representative per NOVEL fingerprint, min `id_col`).

    Store layout is an append-only log of (fp, min_id, n_copies) deltas —
    the same log-structured discipline as the line-dedup segment store:
    no rewrite, reads aggregate (read_exact_dedup_store), so the ingest
    shuffles only fingerprint-sized rows, never bodies. Duplicate copies
    of already-stored content still COUNT (n_copies accumulates — the
    store total equals a from-scratch exact_dedup over everything ever
    ingested) but are not returned as kept rows.

    Idempotency: pass a stable `batch_tag` to slot the delta under
    tag=<batch_tag> with overwrite semantics — re-ingesting the same
    batch replaces its own delta instead of double-counting. The
    streaming twin gets this for free from foreachBatch checkpointing
    (exactly-once per batch id) and passes the batch id as the tag.

    Concurrency contract: single writer per tag (sequential same-tag
    rewrite = last-writer-wins replay; concurrent distinct tags safe;
    concurrent same-tag out of contract, heals on replay) — stated and
    pinned in tests/test_store_concurrency.py."""
    fps = exact_fingerprints(batch, key_cols, id_col, hash_mode)
    delta = fps.groupBy("fp").agg(
        F.min("id").alias("min_id"), F.count(F.lit(1)).alias("n_copies")
    )
    safe = (
        "".join(ch if ch.isalnum() or ch in "-_." else "_" for ch in batch_tag)
        if batch_tag is not None
        else None
    )
    from etl_poc_spark.operators.deltastore import read_delta_store

    try:
        # compaction-aware read (operators/deltastore.py); the exclude
        # drops a REPLAYED tagged batch's own prior delta — otherwise
        # every fp reads as a store hit, kept recomputes as empty, and
        # the replay loses the representatives the crashed attempt never
        # flushed to the kept sink
        store = read_delta_store(
            spark, store_dir,
            exclude_slot=f"tag={safe}" if safe is not None else None,
        )
        store = store.select("fp").distinct()
        have_store = True
    except AnalysisException as exc:
        # first ingest only: the store path does not exist yet. Any OTHER
        # analysis failure must surface — treating a corrupt/unreadable
        # store as "first ingest" would emit duplicates as kept and
        # silently fork the store instead of failing loudly.
        if "PATH_NOT_FOUND" not in str(exc) and "Path does not exist" not in str(exc):
            raise
        have_store = False
    novel = delta.join(store, "fp", "left_anti") if have_store else delta
    # representatives materialize BEFORE the store append (the plan reads
    # the store through the anti-join; parquet listing happens at action
    # time — same seam as incremental_near_dup_ingest)
    reps = novel.select("fp", F.col("min_id").alias("id"))
    kept_ids = fps.join(reps, ["fp", "id"], "left_semi").select(
        F.col("id").alias(id_col)
    )
    kept = batch.join(kept_ids, id_col, "left_semi").localCheckpoint(eager=True)
    if safe is not None:
        delta.write.mode("overwrite").parquet(f"{store_dir}/tag={safe}")
    else:
        delta.write.mode("append").parquet(store_dir)
    return kept


def read_exact_dedup_store(spark: SparkSession, store_dir: str) -> DataFrame:
    """Fold the delta log to the current (fp, min_id, n_copies) state —
    equal to operators.dedup.exact_dedup over the union of every batch
    ever ingested (mergeable: MIN and SUM are associative). Compaction-
    aware: after compact_exact_dedup_store the fold is bit-equal while
    the listing cost drops to O(tail)."""
    from etl_poc_spark.operators.deltastore import read_delta_store

    log = read_delta_store(spark, store_dir)
    return log.groupBy("fp").agg(
        F.min("min_id").alias("min_id"), F.sum("n_copies").alias("n_copies")
    )


def compact_exact_dedup_store(spark: SparkSession, store_dir: str, **kwargs) -> dict:
    """Fold the fingerprint store's old tag slots into one consolidated
    slot (operators/deltastore.py protocol). MIN(min_id) and
    SUM(n_copies) are associative, so reads before and after are
    bit-equal; keep_slots (default 1) protects the in-flight replay."""
    from etl_poc_spark.operators.deltastore import compact_delta_store

    return compact_delta_store(
        spark, store_dir,
        key_cols=["fp"], agg=[("min_id", "min"), ("n_copies", "sum")],
        **kwargs,
    )


def streaming_exact_dedup_ingest(
    stream: DataFrame,
    store_dir: str,
    kept_dir: str,
    checkpoint_dir: str,
    key_cols: list[str],
    id_col: str = "doc_id",
    hash_mode: str = "xxhash64",
):
    """Continuous exact dedup: each micro-batch runs
    incremental_exact_dedup_ingest against the shared fingerprint store
    and appends its novel representatives to `kept_dir`. Returns a
    configured DataStreamWriter — call .trigger(...).start().

    The batch id doubles as the store slot tag, so a replayed micro-batch
    (restart before checkpoint commit) overwrites its own delta instead
    of double-counting — exactly-once store semantics without a
    transaction log. The kept sink is slotted the same way (batch_id
    partition, dynamic overwrite): a replay REPLACES its own kept rows
    rather than re-appending the same representatives — without this the
    store was exactly-once but the output wasn't. Read kept via
    spark.read.parquet(kept_dir); batch_id is an inferred partition
    column."""

    def handle(batch_df: DataFrame, batch_id: int) -> None:
        exact_dedup_handle_batch(
            batch_df, batch_id, store_dir=store_dir, kept_dir=kept_dir,
            key_cols=key_cols, id_col=id_col, hash_mode=hash_mode,
        )

    return stream.writeStream.foreachBatch(handle).option(
        "checkpointLocation", checkpoint_dir
    )


def exact_dedup_handle_batch(
    batch_df: DataFrame,
    batch_id: int,
    *,
    store_dir: str,
    kept_dir: str,
    key_cols: list[str],
    id_col: str = "doc_id",
    hash_mode: str = "xxhash64",
) -> None:
    """One micro-batch of streaming_exact_dedup_ingest, module-level so the
    replay contract is directly testable: calling this twice with the same
    batch_id (at-least-once delivery) leaves store AND kept sink in the
    same state as calling it once — the store via the tag slot, the kept
    sink via batch_id dynamic partition overwrite."""
    kept = incremental_exact_dedup_ingest(
        batch_df.sparkSession, batch_df, store_dir,
        key_cols=key_cols, id_col=id_col, hash_mode=hash_mode,
        batch_tag=f"b{batch_id}",
    )
    (
        kept.withColumn("batch_id", F.lit(int(batch_id)))
        .write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy("batch_id")
        .parquet(kept_dir)
    )


from etl_poc_spark._serde import register_by_value as _rbv  # noqa: E402

_rbv(__name__)
