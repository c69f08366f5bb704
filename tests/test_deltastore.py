"""Delta-log store compaction (operators/deltastore.py): reads must be
bit-equal before and after compaction for every store family, the replay
seam must stay intact (or fail loudly), and the crash windows between the
protocol's three steps must never change what a reader sees."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from etl_poc_spark.operators.deltastore import (
    CompactedSlotReplayError,
    DeltaStoreModeError,
    compact_delta_store,
    load_compaction_manifest,
    read_delta_store,
    vacuum_delta_store,
)


def _rows(df, *cols):
    return sorted(tuple(r[c] for c in cols) for r in df.collect())


def _docs(spark, pairs):
    return spark.createDataFrame(pairs, "doc_id long, text string")


# ---------------------------------------------------------------------------
# exact-dedup store: the generic-protocol vehicle
# ---------------------------------------------------------------------------


def _ingest_exact(spark, store, docs, tag):
    from etl_poc_spark.operators.incremental import incremental_exact_dedup_ingest

    return incremental_exact_dedup_ingest(
        spark, docs, store, ["text"], batch_tag=tag
    )


@pytest.mark.slow
def test_exact_dedup_compaction_reads_bit_equal(spark, tmp_path):
    """Fold-of-folds equivalence: a store compacted mid-history reads
    exactly like its never-compacted twin — including ingests that land
    AFTER the compaction."""
    from etl_poc_spark.operators.incremental import (
        compact_exact_dedup_store,
        read_exact_dedup_store,
    )

    a, b = str(tmp_path / "a"), str(tmp_path / "b")
    batches = [
        [(1, "x"), (2, "y")],
        [(3, "x"), (4, "z")],          # x duplicates batch 1
        [(5, "w"), (6, "y"), (7, "y")],
        [(8, "v"), (9, "x")],
        [(10, "z"), (11, "u")],
    ]
    for i, rows in enumerate(batches[:3]):
        for store in (a, b):
            _ingest_exact(spark, store, _docs(spark, rows), f"b{i}")
    rep = compact_exact_dedup_store(spark, a)  # folds b0,b1; keeps b2
    assert rep["gen"] == 1 and rep["slots_folded"] == 2 and rep["slots_live"] == 1
    assert rep["data_files_after"] < rep["data_files_before"]
    for i, rows in enumerate(batches[3:], start=3):
        ka = _ingest_exact(spark, a, _docs(spark, rows), f"b{i}")
        kb = _ingest_exact(spark, b, _docs(spark, rows), f"b{i}")
        assert _rows(ka, "doc_id") == _rows(kb, "doc_id")
    cols = ("fp", "min_id", "n_copies")
    assert _rows(read_exact_dedup_store(spark, a), *cols) == _rows(
        read_exact_dedup_store(spark, b), *cols
    )


@pytest.mark.slow
def test_multi_generation_compaction_and_vacuum(spark, tmp_path):
    from etl_poc_spark.operators.incremental import (
        compact_exact_dedup_store,
        read_exact_dedup_store,
    )

    a, b = str(tmp_path / "a"), str(tmp_path / "b")
    for i in range(4):
        rows = [(10 * i + j, f"t{(i + j) % 5}") for j in range(3)]
        for store in (a, b):
            _ingest_exact(spark, store, _docs(spark, rows), f"b{i}")
    r1 = compact_exact_dedup_store(spark, a)
    for i in range(4, 7):
        rows = [(10 * i + j, f"t{(i + j) % 5}") for j in range(3)]
        for store in (a, b):
            _ingest_exact(spark, store, _docs(spark, rows), f"b{i}")
    r2 = compact_exact_dedup_store(spark, a)
    assert (r1["gen"], r2["gen"]) == (1, 2)
    man = load_compaction_manifest(spark, a)
    assert man["gen"] == 2 and man["rows_dir"].endswith("00000002")
    # superseded _compacted/00000001 was vacuumed
    import os

    assert os.listdir(f"{a}/_compacted") == ["00000002"]
    cols = ("fp", "min_id", "n_copies")
    assert _rows(read_exact_dedup_store(spark, a), *cols) == _rows(
        read_exact_dedup_store(spark, b), *cols
    )


def test_crash_window_vacuum_deferred_reads_unchanged(spark, tmp_path):
    """Between manifest publish and vacuum (step 2 -> 3 crash), folded
    slots still exist on disk — readers must exclude them by name, not
    double-count. A later vacuum_delta_store changes nothing a reader
    sees."""
    from etl_poc_spark.operators.incremental import (
        compact_exact_dedup_store,
        read_exact_dedup_store,
    )

    a = str(tmp_path / "a")
    for i in range(3):
        _ingest_exact(
            spark, a, _docs(spark, [(10 * i, f"t{i}"), (10 * i + 1, "t0")]), f"b{i}"
        )
    before = _rows(read_exact_dedup_store(spark, a), "fp", "min_id", "n_copies")
    compact_exact_dedup_store(spark, a, vacuum=False)  # folds b0, b1; keeps b2
    import os

    assert {"tag=b0", "tag=b1"} <= set(os.listdir(a))  # residue present
    assert _rows(read_exact_dedup_store(spark, a), "fp", "min_id", "n_copies") == before
    assert vacuum_delta_store(spark, a) == 2
    assert {n for n in os.listdir(a) if n.startswith("tag=")} == {"tag=b2"}
    assert _rows(read_exact_dedup_store(spark, a), "fp", "min_id", "n_copies") == before


def test_replay_of_unfolded_slot_survives_compaction(spark, tmp_path):
    """keep_slots=1 protects the newest slot: replaying it after a
    compaction produces the same kept rows as the original attempt."""
    a = str(tmp_path / "a")
    from etl_poc_spark.operators.incremental import compact_exact_dedup_store

    _ingest_exact(spark, a, _docs(spark, [(1, "x"), (2, "y")]), "b0")
    b1 = _docs(spark, [(3, "x"), (4, "z")])
    kept = _ingest_exact(spark, a, b1, "b1")
    compact_exact_dedup_store(spark, a)  # folds b0 only
    replay = _ingest_exact(spark, a, b1, "b1")
    assert _rows(replay, "doc_id") == _rows(kept, "doc_id") == [(4,)]


def test_replay_of_folded_slot_raises(spark, tmp_path):
    a = str(tmp_path / "a")
    from etl_poc_spark.operators.incremental import compact_exact_dedup_store

    for i in range(3):
        _ingest_exact(spark, a, _docs(spark, [(i, f"t{i}")]), f"b{i}")
    compact_exact_dedup_store(spark, a)  # folds b0, b1
    with pytest.raises(CompactedSlotReplayError, match="tag=b0"):
        _ingest_exact(spark, a, _docs(spark, [(0, "t0")]), "b0")


def test_compaction_noops(spark, tmp_path):
    missing = compact_delta_store(
        spark, str(tmp_path / "nope"), key_cols=["k"], agg=[("n", "sum")]
    )
    assert missing["gen"] == 0 and missing["slots_folded"] == 0
    a = str(tmp_path / "a")
    _ingest_exact(spark, a, _docs(spark, [(1, "x")]), "b0")
    single = compact_delta_store(
        spark, a, key_cols=["fp"], agg=[("min_id", "min"), ("n_copies", "sum")]
    )
    assert single["slots_folded"] == 0  # keep_slots=1 protects the only slot
    with pytest.raises(ValueError, match="unknown agg fn"):
        compact_delta_store(spark, a, key_cols=["fp"], agg=[("n_copies", "avg")])


# ---------------------------------------------------------------------------
# mode-mixing (ADVICE r15)
# ---------------------------------------------------------------------------


def test_batch_id_replay_against_loose_store_raises(spark, tmp_path):
    """A store first written with batch_id=None (loose appends) cannot
    honor a later batch_id replay exclusion — pre-fix the ingest silently
    double-counted its own prior attempt as history; now it raises."""
    from etl_poc_spark.operators.linededup import incremental_line_dedup_ingest
    from etl_poc_spark.operators.spandedup import incremental_span_removal_ingest

    text = " ".join(f"w{i}" for i in range(30))
    docs = _docs(spark, [(1, text), (2, text)])
    line_store = str(tmp_path / "lines")
    incremental_line_dedup_ingest(spark, docs, line_store)  # loose mode
    with pytest.raises(DeltaStoreModeError, match="loose"):
        incremental_line_dedup_ingest(spark, docs, line_store, batch_id=7)
    span_store = str(tmp_path / "spans")
    incremental_span_removal_ingest(spark, docs, span_store)  # loose mode
    with pytest.raises(DeltaStoreModeError, match="loose"):
        incremental_span_removal_ingest(spark, docs, span_store, batch_id=7)


# ---------------------------------------------------------------------------
# per-family equivalence: compacted == never-compacted
# ---------------------------------------------------------------------------


@pytest.mark.slow
def test_bigram_lm_store_compaction_bit_equal(spark, tmp_path):
    from etl_poc_spark.operators.ngram_lm import (
        compact_bigram_lm_store,
        incremental_bigram_lm_ingest,
        read_bigram_lm_store,
    )

    a, b = str(tmp_path / "a"), str(tmp_path / "b")
    batches = [
        ["the cat sat", "the dog sat"],
        ["the cat ran", "a dog ran far"],
        ["the end", "cat and dog"],
    ]
    for i, texts in enumerate(batches):
        df = spark.createDataFrame([(t,) for t in texts], "text string")
        for store in (a, b):
            incremental_bigram_lm_ingest(spark, df, store, batch_tag=f"b{i}")
    rep = compact_bigram_lm_store(spark, a)
    assert rep["bigrams"]["slots_folded"] == 2 and rep["tokens"]["slots_folded"] == 2
    bi_a, uni_a, v_a = read_bigram_lm_store(spark, a)
    bi_b, uni_b, v_b = read_bigram_lm_store(spark, b)
    assert _rows(bi_a, "bigram", "c_bi") == _rows(bi_b, "bigram", "c_bi")
    assert _rows(uni_a, "w1", "c_uni") == _rows(uni_b, "w1", "c_uni")
    assert v_a.collect()[0]["v"] == v_b.collect()[0]["v"]
    # the protected newest tag still honors the replay exclusion
    bi_x, _, _ = read_bigram_lm_store(spark, a, exclude_tag="b2")
    bi_y, _, _ = read_bigram_lm_store(spark, b, exclude_tag="b2")
    assert _rows(bi_x, "bigram", "c_bi") == _rows(bi_y, "bigram", "c_bi")


@pytest.mark.slow
def test_line_and_span_store_compaction_bit_equal(spark, tmp_path):
    from etl_poc_spark.operators.linededup import (
        compact_line_dedup_store,
        incremental_line_dedup_ingest,
    )
    from etl_poc_spark.operators.spandedup import (
        compact_span_store,
        incremental_span_removal_ingest,
    )

    boiler = " ".join(f"b{i}" for i in range(10))
    uniq = lambda i: " ".join(f"u{i}_{j}" for j in range(10))  # noqa: E731
    batches = [
        [(1, f"{boiler} {uniq(1)}"), (2, f"{boiler} {uniq(2)}")],
        [(3, f"{boiler} {uniq(3)}"), (4, uniq(4))],
        [(5, f"{boiler} {uniq(5)}"), (6, uniq(6))],
    ]
    for fam, ingest, compact in (
        ("lines", incremental_line_dedup_ingest, compact_line_dedup_store),
        ("spans", incremental_span_removal_ingest, compact_span_store),
    ):
        a, b = str(tmp_path / f"{fam}_a"), str(tmp_path / f"{fam}_b")
        outs_a, outs_b = [], []
        for i, rows in enumerate(batches[:2]):
            outs_a.append(ingest(spark, _docs(spark, rows), a, batch_id=i))
            outs_b.append(ingest(spark, _docs(spark, rows), b, batch_id=i))
        rep = compact(spark, a)
        assert rep["slots_folded"] == 1 and rep["slots_live"] == 1, fam
        oa = ingest(spark, _docs(spark, batches[2]), a, batch_id=2)
        ob = ingest(spark, _docs(spark, batches[2]), b, batch_id=2)
        cols = tuple(oa.columns)
        assert _rows(oa, *cols) == _rows(ob, *cols), fam
        # and the protected newest batch replays byte-identically
        ra = ingest(spark, _docs(spark, batches[2]), a, batch_id=2)
        assert _rows(ra, *cols) == _rows(oa, *cols), fam


@pytest.mark.slow
def test_near_dup_band_store_compaction_set_equal(spark, tmp_path):
    """The SET-store fold (agg=[] → DISTINCT): compacting the band store
    must leave every semi-join verdict unchanged — kept outputs for
    post-compaction ingests equal the never-compacted twin's."""
    from etl_poc_spark.operators.incremental import (
        compact_near_dup_store,
        incremental_near_dup_ingest,
    )

    words = lambda i: " ".join(f"w{i}_{j}" for j in range(12))  # noqa: E731
    batches = [
        [(1, words(1)), (2, words(2))],
        [(3, words(3)), (4, words(4))],
        # 10 duplicates stored doc 1; 13/14 near-pair within the batch
        [(10, words(1)), (13, words(13)), (14, words(13))],
    ]
    a, b = str(tmp_path / "a"), str(tmp_path / "b")
    for i, rows in enumerate(batches[:2]):
        incremental_near_dup_ingest(spark, _docs(spark, rows), a, batch_id=i)
        incremental_near_dup_ingest(spark, _docs(spark, rows), b, batch_id=i)
    rep = compact_near_dup_store(spark, a)
    assert rep["slots_folded"] == 1 and rep["slots_live"] == 1
    ka = incremental_near_dup_ingest(spark, _docs(spark, batches[2]), a, batch_id=2)
    kb = incremental_near_dup_ingest(spark, _docs(spark, batches[2]), b, batch_id=2)
    assert _rows(ka, "doc_id") == _rows(kb, "doc_id") == [(13,)]


@pytest.mark.slow
def test_dsir_badwords_doremi_store_compaction_bit_equal(spark, tmp_path):
    from etl_poc_spark.operators.curation import (
        compact_badwords_store,
        compact_doremi_store,
        incremental_badwords_ingest,
        incremental_doremi_ingest,
        read_badwords_store,
        read_doremi_store,
    )
    from etl_poc_spark.operators.dsir import (
        compact_dsir_store,
        incremental_dsir_ingest,
        read_dsir_model,
    )

    # DSIR: both roles, 3 tagged batches each
    a, b = str(tmp_path / "dsir_a"), str(tmp_path / "dsir_b")
    for i in range(3):
        df = spark.createDataFrame(
            [(f"alpha beta doc{i} gamma w{j}",) for j in range(4)], "text string"
        )
        for store in (a, b):
            incremental_dsir_ingest(spark, df, store, role="raw", batch_tag=f"b{i}")
            incremental_dsir_ingest(
                spark, df.limit(2), store, role="target", batch_tag=f"b{i}"
            )
    rep = compact_dsir_store(spark, a)
    assert rep["raw"]["slots_folded"] == 2 and rep["target"]["slots_folded"] == 2
    cols = ("bucket", "c_raw", "c_tgt", "t_raw", "t_tgt")
    ma = read_dsir_model(spark, a, n_buckets=64)
    mb = read_dsir_model(spark, b, n_buckets=64)
    assert _rows(ma, *cols) == _rows(mb, *cols)

    # badwords + doremi: additive per-domain partials
    docs = spark.createDataFrame(
        [("s1", "clean text"), ("s2", "badword here"), ("s1", "more badword")],
        "source string, text string",
    )
    losses = spark.createDataFrame(
        [("s1", 5), ("s2", 9), ("s1", 0)], "source string, excess long"
    )
    bw_a, bw_b = str(tmp_path / "bw_a"), str(tmp_path / "bw_b")
    dm_a, dm_b = str(tmp_path / "dm_a"), str(tmp_path / "dm_b")
    for i in range(3):
        for store in (bw_a, bw_b):
            incremental_badwords_ingest(spark, docs, store, batch_tag=f"b{i}")
        for store in (dm_a, dm_b):
            incremental_doremi_ingest(spark, losses, store, batch_tag=f"b{i}")
    assert compact_badwords_store(spark, bw_a)["slots_folded"] == 2
    assert compact_doremi_store(spark, dm_a)["slots_folded"] == 2
    cols = ("domain", "n_docs", "n_flagged", "n_hits")
    assert _rows(read_badwords_store(spark, bw_a), *cols) == _rows(
        read_badwords_store(spark, bw_b), *cols
    )
    cols = ("domain", "n_examples", "sum_excess")
    assert _rows(read_doremi_store(spark, dm_a), *cols) == _rows(
        read_doremi_store(spark, dm_b), *cols
    )


def test_exclude_only_slot_reads_empty_with_schema(spark, tmp_path):
    """A replay that excludes the store's ONLY slot must see an EMPTY
    frame carrying the store schema (the pre-batch view) — the case the
    old column-filter exclusion produced naturally."""
    a = str(tmp_path / "a")
    _ingest_exact(spark, a, _docs(spark, [(1, "x")]), "b0")
    df = read_delta_store(spark, a, exclude_slot="tag=b0")
    assert df.count() == 0
    assert set(df.columns) == {"fp", "min_id", "n_copies"}


def test_read_delta_store_missing_raises_path_not_found(spark, tmp_path):
    """The families' first-ingest seam: a missing store must surface the
    engine's own PATH_NOT_FOUND AnalysisException through the helper."""
    from pyspark.errors import AnalysisException

    with pytest.raises(AnalysisException) as exc:
        read_delta_store(spark, str(tmp_path / "missing")).collect()
    assert "PATH_NOT_FOUND" in str(exc.value) or "Path does not exist" in str(
        exc.value
    )


def test_fully_compacted_store_reads_consolidated_only(spark, tmp_path):
    """keep_slots=0 folds everything; the store root then holds only
    hidden dirs and reads come entirely from the consolidated slot."""
    from etl_poc_spark.operators.incremental import (
        compact_exact_dedup_store,
        read_exact_dedup_store,
    )

    a = str(tmp_path / "a")
    for i in range(3):
        _ingest_exact(spark, a, _docs(spark, [(i, f"t{i % 2}")]), f"b{i}")
    before = _rows(read_exact_dedup_store(spark, a), "fp", "min_id", "n_copies")
    rep = compact_exact_dedup_store(spark, a, keep_slots=0)
    assert rep["slots_folded"] == 3 and rep["slots_live"] == 0
    import os

    assert all(n.startswith(("_", ".")) for n in os.listdir(a))
    assert _rows(read_exact_dedup_store(spark, a), "fp", "min_id", "n_copies") == before
    # and new ingests keep working on top of the consolidated state
    kept = _ingest_exact(spark, a, _docs(spark, [(9, "t0"), (10, "new")]), "b3")
    assert _rows(kept, "doc_id") == [(10,)]
