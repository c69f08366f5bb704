"""Delta-log store compaction — fold a slotted append-only store into one
consolidated slot, with reads byte-identical before and after.

Every incremental-store family in this repo (bigram LM `operators/
ngram_lm.py`, DSIR `operators/dsir.py`, exact dedup `operators/
incremental.py`, line dedup `operators/linededup.py`, span dedup
`operators/spandedup.py`, badwords + DoReMi `operators/curation.py`)
keeps the same discipline: each ingested batch appends one SLOT of
pre-aggregated delta rows — a `tag=<batch_tag>` directory, a
`batch_id=<n>` directory, or loose part-files at the store root — and
reads fold the whole log with an associative groupBy aggregate. That
read is O(#batches) file listings and scans forever: a year-long crawl
at one batch per minute accumulates ~500k slots, and every ingest's
history read pays for all of them.

`compact_delta_store` folds the old slots into ONE consolidated slot
holding the same aggregate the readers compute, so the fold-of-folds is
bit-equal (the aggregates are exact-integer SUM/MIN/MAX — associative
under any regrouping). The crash-safety discipline is the
`checkpoint_versioned` one (operators/upsert.py:335): the consolidated
rows land in a HIDDEN directory first (underscore-prefixed — invisible
to Spark's file index, hence to every reader), then a single atomic
rename publishes a manifest naming the folded slots; readers always act
on the newest manifest. A crash before the publish changes nothing a
reader can see; a crash after it (mid-vacuum) leaves folded slots that
readers already exclude by name.

Store layout after n compactions::

    store_dir/
      _compactions/0000000n.json   <- newest manifest wins
      _compacted/0000000n/         <- consolidated rows (hidden dir)
      tag=.../ | batch_id=.../     <- live tail slots (not yet folded)

Manifest: {"gen": n, "folded": [every slot name ever folded],
"rows_dir": "_compacted/0000000n"}. `folded` is CUMULATIVE, so a reader
needs only the newest manifest: current state = consolidated rows +
(root slots minus folded).

Replay/concurrency contract (stated, and pinned by
tests/test_deltastore.py):

- Compaction is a MAINTENANCE operation: one compactor at a time, and
  only over slots whose batches are COMMITTED. `keep_slots` (default 1)
  always leaves the newest slots unfolded, so a streaming replay of the
  in-flight batch — which must read the store minus its own slot — never
  finds its slot folded. If a replay DOES name a folded slot, the read
  raises `CompactedSlotReplayError` instead of silently double-counting.
- Concurrent ingest of NEW slots during compaction is safe: a slot
  written after the compactor listed the root is simply not a fold
  candidate and stays live.
- Vacuum (on by default) deletes the folded slot files after the
  manifest publish. A reader that planned its scan before the publish
  and acts after the vacuum can hit a missing-file error — the same
  window every last-writer-wins slot overwrite already has; schedule
  compaction in the ingest maintenance loop, or pass vacuum=False and
  `vacuum_delta_store` later.

The reference system has no continuous-ingest store at all (its DAG
recomputes from sources each run — airflow/dags/zara_hybrid_etl.py); this
tier exists for the 100 TB crawl case where recomputing history is not an
option and O(#batches) reads eventually dominate ingest cost.
"""

from __future__ import annotations

import json

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from etl_poc_spark.operators.upsert import _hfs, _join, _read_commit

_COMPACTIONS = "_compactions"
_COMPACTED = "_compacted"

_AGG_FNS = {"sum": F.sum, "min": F.min, "max": F.max}


class CompactedSlotReplayError(RuntimeError):
    """A replay asked to exclude a slot that compaction already folded —
    the store can no longer reconstruct the pre-batch view, so reading on
    would double-count the batch against its own folded delta. Fold only
    committed batches (keep_slots guards the in-flight tail)."""


class DeltaStoreModeError(RuntimeError):
    """Slot-keyed exclusion was requested on a store that (also) holds
    LOOSE appended files — rows that no slot name can ever exclude, so
    the replay guarantee would silently degrade (ADVICE r15: a store
    first written with batch_id=None, then ingested with a batch_id).
    Pick one mode per store: always tagged/batched, or never."""


def _root_entries(spark: SparkSession, store_dir: str) -> list[dict] | None:
    """Non-hidden direct children of the store root, or None if the store
    directory does not exist. Hidden names (`_`/`.` prefix) are exactly
    the ones Spark's file index skips — the manifest and consolidated
    rows live there, invisible to readers that don't ask for them."""
    fs, P = _hfs(spark, store_dir)
    p = P(store_dir)
    if not fs.exists(p):
        return None
    out = []
    for st in fs.listStatus(p):
        name = st.getPath().getName()
        if name.startswith("_") or name.startswith("."):
            continue
        out.append(
            {
                "name": name,
                "is_file": bool(st.isFile()),
                "mtime": int(st.getModificationTime()),
            }
        )
    return out


def load_compaction_manifest(spark: SparkSession, store_dir: str) -> dict | None:
    """The NEWEST published compaction manifest, or None. Readers never
    need older ones: `folded` is cumulative by construction."""
    cdir = _join(store_dir, _COMPACTIONS)
    fs, P = _hfs(spark, cdir)
    if not fs.exists(P(cdir)):
        return None
    names = sorted(
        st.getPath().getName()
        for st in fs.listStatus(P(cdir))
        if st.getPath().getName().endswith(".json")
        and not st.getPath().getName().startswith(".")
    )
    if not names:
        return None
    return _read_commit(fs, P, spark._jvm, _join(cdir, names[-1]))


def _exclusion_filter(df: DataFrame, drop: list[dict]) -> DataFrame:
    """Row-level exclusion of specific root entries from a recursive read
    — the same input_file_name seam every tagged replay read already
    uses; `drop` is small by construction (vacuum residue + at most one
    replay slot), so this never becomes an O(#slots) predicate."""
    cond = None
    for e in drop:
        c = (
            F.input_file_name().endswith("/" + e["name"])
            if e["is_file"]
            else F.input_file_name().contains("/" + e["name"] + "/")
        )
        cond = c if cond is None else (cond | c)
    return df if cond is None else df.where(~cond)


def read_delta_store(
    spark: SparkSession, store_dir: str, *, exclude_slot: str | None = None
) -> DataFrame:
    """The store's current UNFOLDED delta rows — consolidated rows (if a
    compaction manifest exists) plus every live slot — with `exclude_slot`
    (a slot name like 'tag=batch-7' or 'batch_id=7') dropped: the replay
    seam, identical in semantics to the per-family input_file_name /
    batch_id-column exclusion it replaces. Callers apply their own
    associative fold on top, so pre-compaction plans are unchanged: with
    no manifest this is exactly the one recursive parquet read every
    family always did (a missing store raises the engine's own
    AnalysisException — the families' first-ingest seam).

    Raises CompactedSlotReplayError if the excluded slot was already
    folded, and DeltaStoreModeError if slot exclusion is requested while
    loose (slot-less) appended files exist (ADVICE r15)."""
    entries = _root_entries(spark, store_dir)
    if entries is None:
        # missing store: surface the genuine PATH_NOT_FOUND AnalysisException
        return spark.read.option("recursiveFileLookup", "true").parquet(store_dir)
    man = load_compaction_manifest(spark, store_dir)
    if man is None and not entries:
        # empty-but-existing dir: surface the genuine schema-inference error
        return spark.read.option("recursiveFileLookup", "true").parquet(store_dir)
    folded = set(man["folded"]) if man else set()
    if exclude_slot is not None:
        if exclude_slot in folded:
            raise CompactedSlotReplayError(
                f"slot {exclude_slot!r} of store {store_dir!r} was folded by "
                f"compaction gen {man['gen']}; the pre-batch view no longer "
                "exists — fold only committed batches (keep_slots)"
            )
        loose = [e["name"] for e in entries if e["is_file"]]
        if loose:
            raise DeltaStoreModeError(
                f"store {store_dir!r} holds loose appended files "
                f"({loose[:3]}...) that slot exclusion can never drop; "
                "replaying with a slot id against a loose-append store "
                "silently double-counts history (ADVICE r15)"
            )
    drop = [
        e
        for e in entries
        if e["name"] in folded or e["name"] == exclude_slot
    ]
    parts: list[DataFrame] = []
    if man is not None:
        parts.append(
            spark.read.option("recursiveFileLookup", "true").parquet(
                _join(store_dir, man["rows_dir"])
            )
        )
    if entries:
        # read the tail even when every entry is dropped — a replay that
        # excludes the store's ONLY slot must see an EMPTY frame with the
        # store's schema (the pre-batch view), exactly like the old
        # column-filter exclusion did
        tail = spark.read.option("recursiveFileLookup", "true").parquet(store_dir)
        parts.append(_exclusion_filter(tail, drop))
    df = parts[0]
    for extra in parts[1:]:
        df = df.unionByName(extra)
    return df


def _count_data_files(spark: SparkSession, store_dir: str) -> int:
    """Visible (non-hidden-path) data files under the store — what a
    reader's file index must list; the cost metric compaction exists to
    shrink."""
    fs, P = _hfs(spark, store_dir)
    if not fs.exists(P(store_dir)):
        return 0
    n = 0
    stack = [P(store_dir)]
    while stack:
        d = stack.pop()
        for st in fs.listStatus(d):
            name = st.getPath().getName()
            if name.startswith("_") or name.startswith("."):
                continue
            if st.isFile():
                n += 1
            else:
                stack.append(st.getPath())
    return n


def compact_delta_store(
    spark: SparkSession,
    store_dir: str,
    *,
    key_cols: list[str],
    agg: list[tuple[str, str]],
    keep_slots: int = 1,
    protect_slots: tuple[str, ...] = (),
    vacuum: bool = True,
    num_files: int | None = None,
) -> dict:
    """Fold all committed slots of the delta-log store at `store_dir` into
    one consolidated hidden slot and publish the manifest. `agg` is the
    family's fold, [(col, 'sum'|'min'|'max'), ...] — the same associative
    aggregate its readers apply, so reads before and after are bit-equal
    under any batch slicing. `keep_slots` newest slots (by FS mtime) stay
    unfolded for the in-flight replay seam; `protect_slots` names more.

    Protocol (crash-safe at every step boundary):
      1. write fold(prev consolidated + candidate slots) to the hidden
         `_compacted/<gen>` dir — invisible to readers; a crash here
         leaves an orphan the next attempt overwrites;
      2. publish `_compactions/<gen>.json` via tmp + atomic rename — the
         single visibility switch (the checkpoint_versioned discipline);
      3. vacuum the folded slot files (readers already exclude them by
         name, so a partial vacuum is harmless).

    Returns {"gen", "slots_folded", "slots_live", "data_files_before",
    "data_files_after"}; gen=0 means nothing to fold (no-op)."""
    if keep_slots < 0:
        raise ValueError("keep_slots must be >= 0")
    for _c, fn in agg:
        if fn not in _AGG_FNS:
            raise ValueError(f"unknown agg fn {fn!r}; pick from {sorted(_AGG_FNS)}")
    # agg=[] is the SET-store fold: rows are facts with no counts (e.g. the
    # near-dup band postings), so consolidation is DISTINCT over key_cols —
    # idempotent and associative like the integer folds, and bit-equal for
    # every reader that treats the store as a set (semi-joins)
    entries = _root_entries(spark, store_dir)
    if entries is None:
        return {"gen": 0, "slots_folded": 0, "slots_live": 0,
                "data_files_before": 0, "data_files_after": 0}
    files_before = _count_data_files(spark, store_dir)
    man = load_compaction_manifest(spark, store_dir)
    folded = set(man["folded"]) if man else set()
    live = sorted(
        (e for e in entries if e["name"] not in folded),
        key=lambda e: (e["mtime"], e["name"]),
    )
    protected = set(protect_slots)
    if keep_slots:
        protected.update(e["name"] for e in live[max(0, len(live) - keep_slots):])
    candidates = [e for e in live if e["name"] not in protected]
    if not candidates:
        return {"gen": man["gen"] if man else 0, "slots_folded": 0,
                "slots_live": len(live),
                "data_files_before": files_before,
                "data_files_after": files_before}
    gen = (man["gen"] + 1) if man else 1

    # 1. fold: previous consolidated rows + candidate slots, one recursive
    # read with the (small) protected/folded residue filtered out
    drop = [e for e in entries if e["name"] in folded or e["name"] in protected]
    tail = _exclusion_filter(
        spark.read.option("recursiveFileLookup", "true").parquet(store_dir),
        drop,
    )
    if man is not None:
        prev = spark.read.option("recursiveFileLookup", "true").parquet(
            _join(store_dir, man["rows_dir"])
        )
        tail = prev.unionByName(tail)
    if agg:
        out_cols = [c for c, _fn in agg]
        consolidated = tail.groupBy(*key_cols).agg(
            *[_AGG_FNS[fn](c).alias(c) for c, fn in agg]
        ).select(*key_cols, *out_cols)
    else:
        consolidated = tail.select(*key_cols).distinct()
    if num_files is not None:
        consolidated = consolidated.repartition(num_files, *key_cols)
    rows_dir = f"{_COMPACTED}/{gen:08d}"
    consolidated.write.mode("overwrite").parquet(_join(store_dir, rows_dir))

    # 2. publish the manifest — the atomic visibility switch
    new_folded = sorted(folded | {e["name"] for e in candidates})
    manifest = {"gen": gen, "folded": new_folded, "rows_dir": rows_dir}
    cdir = _join(store_dir, _COMPACTIONS)
    fs, P = _hfs(spark, cdir)
    fs.mkdirs(P(cdir))
    tmp = P(_join(cdir, f".tmp_{gen:08d}.json"))
    out = fs.create(tmp, True)
    try:
        out.write(bytearray(json.dumps(manifest).encode("utf-8")))
    finally:
        out.close()
    dst = P(_join(cdir, f"{gen:08d}.json"))
    if fs.exists(dst) or not fs.rename(tmp, dst):
        fs.delete(tmp, False)
        raise RuntimeError(
            f"concurrent compaction detected at {store_dir!r} gen {gen} — "
            "compaction is single-maintainer by contract"
        )

    # 3. vacuum the folded files (already invisible to readers)
    if vacuum:
        vacuum_delta_store(spark, store_dir)
    return {
        "gen": gen,
        "slots_folded": len(candidates),
        "slots_live": len(live) - len(candidates),
        "data_files_before": files_before,
        "data_files_after": _count_data_files(spark, store_dir),
    }


def vacuum_delta_store(spark: SparkSession, store_dir: str) -> int:
    """Delete folded slots (per the newest manifest) still present at the
    store root, plus superseded `_compacted/<gen>` dirs. Safe at any time
    after a manifest publish — readers exclude these names already.
    Returns the number of entries deleted."""
    man = load_compaction_manifest(spark, store_dir)
    if man is None:
        return 0
    fs, P = _hfs(spark, store_dir)
    folded = set(man["folded"])
    deleted = 0
    for st in fs.listStatus(P(store_dir)):
        if st.getPath().getName() in folded:
            fs.delete(st.getPath(), True)
            deleted += 1
    comp = _join(store_dir, _COMPACTED)
    keep = man["rows_dir"].split("/")[-1]
    if fs.exists(P(comp)):
        for st in fs.listStatus(P(comp)):
            if st.getPath().getName() != keep:
                fs.delete(st.getPath(), True)
                deleted += 1
    return deleted
