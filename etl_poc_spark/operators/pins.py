"""Tracked persist() for intra-query stage frames.

Several operators persist an intermediate frame that feeds multiple branches
of the SAME query plan (LSH bands, BM25 term frequencies, shingle tables).
The returned query frame is lazy, so the operator itself has no "after the
final action" point at which to unpersist — which previously leaked the
pinned blocks into the session for library callers (bench.py worked around
it with spark.catalog.clearCache()).

`pin(df)` persists and registers the frame; `release_pins()` unpersists
everything registered. Callers run their action on the returned query frame
(the pins populate and get reused during that action), then release:

    result = minhash_lsh_pairs(...)
    result.write.parquet(...)   # pins populate + serve branch reuse here
    release_pins()              # drop the stage blocks from the session

Releasing BEFORE the action is safe too — the frames just lose caching and
branches recompute (correctness is unaffected).
"""

from __future__ import annotations

from pyspark.sql import DataFrame

_PINNED: list[DataFrame] = []

# Process-level trained-model memos (kmeans centroids, PQ codebooks, BPE
# merges) registered by the query modules that own them. They exist so a
# long-lived SESSION (gates, entry, production serving) trains once per
# data fingerprint — but a BENCHMARK that keeps them warm across its
# repeated runs amortizes training out of runs 2..N and publishes medians
# that understate cold-run cost (r16 verdict item 3). bench.py and
# tools/time_query.py call clear_memos() between timed runs so every run
# pays training; nothing else should call it.
_MEMOS: list[dict] = []


def register_memo(memo: dict) -> dict:
    """Track a process-level model memo dict for clear_memos()."""
    _MEMOS.append(memo)
    return memo


def clear_memos() -> int:
    """Empty every registered model memo; returns how many held entries."""
    n = 0
    for m in _MEMOS:
        if m:
            n += 1
            m.clear()
    return n


def pin(df: DataFrame) -> DataFrame:
    """Persist `df` and track it for a later release_pins()."""
    df.persist()
    _PINNED.append(df)
    return df


def release_pins() -> int:
    """Unpersist every tracked frame; returns how many were released."""
    n = 0
    while _PINNED:
        df = _PINNED.pop()
        try:
            df.unpersist()
            n += 1
        except Exception:
            # session already stopped — the blocks are gone anyway
            pass
    return n
