"""Custom stateful streaming operator: incremental sessionization via
`applyInPandasWithState` (SURVEY.md §2.10 — the engine's custom-stateful
building block).

Unlike `F.session_window` (which emits closed windows), this operator keeps
one running state per user and emits a row per updated session on every
micro-batch — the shape needed for "session so far" features in an online
training-data pipeline. State per key is a single (session_start,
last_ts, n_events) triple; the timeout closes idle sessions so the state
store stays bounded (the 100 TB concern for any keyed stream).
"""

from __future__ import annotations

from typing import Any, Iterator, Tuple

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

SESSION_GAP_SECONDS = 30 * 60

OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("session_start", T.TimestampType()),
        T.StructField("last_ts", T.TimestampType()),
        T.StructField("n_events", T.LongType()),
    ]
)

STATE_SCHEMA = T.StructType(
    [
        T.StructField("session_start", T.LongType()),  # epoch micros
        T.StructField("last_ts", T.LongType()),
        T.StructField("n_events", T.LongType()),
    ]
)


def _sessionize_group(
    key: Tuple[Any, ...],
    pdfs: Iterator[pd.DataFrame],
    state: GroupState,
    gap_seconds: int = SESSION_GAP_SECONDS,
) -> Iterator[pd.DataFrame]:
    (user_id,) = key
    if state.hasTimedOut:
        # idle longer than the gap: the session is over and its state is
        # evicted — THIS is what bounds the state store at corpus scale
        state.remove()
        return

    start, last, n = state.get if state.exists else (None, None, 0)
    # Vectorized fold (no per-row Python): session boundaries are exactly
    # the positions where the gap to the previous event exceeds the
    # threshold, so one sorted timestamp vector + one diff gives every
    # segment; the carried state only affects whether the first segment
    # continues the open session.
    parts = [pdf["ts"] for pdf in pdfs if len(pdf)]
    m = (
        np.sort(pd.concat(parts).to_numpy(dtype="datetime64[ns]").astype("int64"))
        // 1000
        if parts
        else np.empty(0, dtype="int64")
    )
    gap_us = gap_seconds * 1_000_000
    rows: list[tuple] = []
    if m.size:
        flags = np.empty(m.size, dtype=bool)
        flags[0] = last is None or m[0] - last > gap_us
        np.greater(m[1:] - m[:-1], gap_us, out=flags[1:])
        begins = np.flatnonzero(flags)
        if flags[0] and last is not None:
            rows.append((user_id, start, last, n))  # carried session closed
        if not flags[0]:
            begins = np.concatenate(([0], begins))
        ends = np.append(begins[1:], m.size)
        firsts, lasts = m[begins], m[ends - 1]
        counts = ends - begins
        seg_starts = firsts.tolist()
        seg_counts = counts.tolist()
        if not flags[0] and last is not None:  # segment 0 continues the carry
            seg_starts[0] = start
            seg_counts[0] += n
        for i in range(len(seg_starts) - 1):  # all but the final close now
            rows.append((user_id, seg_starts[i], int(lasts[i]), int(seg_counts[i])))
        start, last, n = seg_starts[-1], int(lasts[-1]), int(seg_counts[-1])
    state.update((start, last, n))
    state.setTimeoutDuration(gap_seconds * 1000)
    rows.append((user_id, start, last, n))  # current (possibly open) session
    yield pd.DataFrame(
        {
            "user_id": [r[0] for r in rows],
            "session_start": [pd.Timestamp(r[1], unit="us") for r in rows],
            "last_ts": [pd.Timestamp(r[2], unit="us") for r in rows],
            "n_events": [r[3] for r in rows],
        }
    )


def stateful_sessionize(events: DataFrame, gap_seconds: int = SESSION_GAP_SECONDS) -> DataFrame:
    """events stream -> per-user running session rows (update mode).
    `gap_seconds` is both the session gap and the state-eviction timeout."""

    def fn(key, pdfs, state):  # closure binds the configured gap
        return _sessionize_group(key, pdfs, state, gap_seconds)

    return events.groupBy("user_id").applyInPandasWithState(
        fn,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.ProcessingTimeTimeout,
    )


DEBOUNCE_OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("event_id", T.LongType()),
        T.StructField("user_id", T.LongType()),
        T.StructField("event_type", T.StringType()),
        T.StructField("ts", T.TimestampType()),
    ]
)

DEBOUNCE_STATE_SCHEMA = T.StructType([T.StructField("last_ts", T.LongType())])


def _debounce_group(
    key: Tuple[Any, ...],
    pdfs: Iterator[pd.DataFrame],
    state: GroupState,
    within_seconds: int,
) -> Iterator[pd.DataFrame]:
    user_id, event_type = key
    if state.hasTimedOut:
        # a key idle past the debounce horizon can never suppress a
        # future event — drop its state (bounds the store, same as
        # sessionize eviction)
        state.remove()
        return
    (last,) = state.get if state.exists else (None,)
    # Vectorized fold: `last` advances to EVERY event's time (kept or
    # not — the batch operators/funnel.py::debounce_flag lag-vs-previous
    # formulation), so the keep decision is a pure adjacent diff: row i
    # survives iff ts[i] - ts[i-1] >= window, with the carried `last`
    # standing in as row -1. No recurrence on the kept set -> one numpy
    # compare per batch instead of per-row Python.
    parts = [pdf for pdf in pdfs if len(pdf)]
    if parts:
        batch = (
            pd.concat(parts)
            .sort_values(["ts", "event_id"])
            .reset_index(drop=True)
        )
        m = batch["ts"].to_numpy(dtype="datetime64[ns]").astype("int64") // 1000
        win_us = within_seconds * 1_000_000
        keep_mask = np.empty(m.size, dtype=bool)
        if last is None:
            keep_mask[0] = True
        else:
            keep_mask[0] = m[0] - last >= win_us
        np.greater_equal(m[1:] - m[:-1], win_us, out=keep_mask[1:])
        last = int(m[-1])
        kept = batch[keep_mask]
    else:
        kept = None
    state.update((last,))
    state.setTimeoutDuration(within_seconds * 1000)
    if kept is not None and len(kept):
        yield pd.DataFrame(
            {
                "event_id": kept["event_id"].astype("int64").to_numpy(),
                "user_id": user_id,
                "event_type": event_type,
                "ts": kept["ts"].to_numpy(),
            }
        )


def stateful_debounce(events: DataFrame, within_seconds: int = 120) -> DataFrame:
    """Streaming twin of operators/funnel.py::debounce: drop events the
    same (user, type) emitted less than `within_seconds` after its
    previous event. State per key is ONE long (the previous event's
    timestamp); the timeout evicts keys idle past the horizon. Equal to
    the batch lag formulation whenever per-key arrival order matches
    event-time order (the append-mode contract; out-of-order keys need
    the watermarked batch operator instead)."""

    def fn(key, pdfs, state):
        return _debounce_group(key, pdfs, state, within_seconds)

    return events.groupBy("user_id", "event_type").applyInPandasWithState(
        fn,
        outputStructType=DEBOUNCE_OUTPUT_SCHEMA,
        stateStructType=DEBOUNCE_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.ProcessingTimeTimeout,
    )


def _funnel_output_schema(step_names: list[str]) -> T.StructType:
    return T.StructType(
        [T.StructField("user_id", T.LongType())]
        + [T.StructField(f"t_{n}", T.TimestampType()) for n in step_names]
    )


def _funnel_group(
    key: Tuple[Any, ...],
    pdfs: Iterator[pd.DataFrame],
    state: GroupState,
    step_types: list,
    max_gap_seconds: int | None,
    value_col: str = "value",
) -> Iterator[pd.DataFrame]:
    (user_id,) = key
    # each step: bare event_type string, or (event_type, min_value,
    # max_value) with None bounds meaning unbounded — the compiled form
    # of the portable spec (operators/funnel.py::compile_funnel_steps)
    steps = [
        (s, None, None) if isinstance(s, str) else tuple(s) for s in step_types
    ]
    n = len(steps)
    times = list(state.get) if state.exists else [None] * n
    # Vectorized fold, relying on the enforced-distinct step types: an
    # event's type matches AT MOST ONE step, so the time-ordered scan
    # collapses to a sequential pass over the N steps (N tiny), each a
    # numpy min over that step's qualifying events. Equivalence with the
    # row scan: times[i-1], once set, never changes, and any event with
    # ts strictly greater than it sorts after the event that set it — so
    # "step open when the event was scanned" == "ts > times[i-1]".
    parts = [pdf for pdf in pdfs if len(pdf)]
    if parts:
        batch = pd.concat(parts)
        m = batch["ts"].to_numpy(dtype="datetime64[ns]").astype("int64") // 1000
        et = batch["event_type"].to_numpy()
        vals = (
            batch[value_col].to_numpy(dtype="float64")
            if value_col in batch.columns
            else None
        )
        gap_us = (
            max_gap_seconds * 1_000_000 if max_gap_seconds is not None else None
        )
        for i, (st, lo, hi) in enumerate(steps):
            if times[i] is not None:
                continue  # in-order greedy step times are final
            if i > 0 and times[i - 1] is None:
                break  # later steps cannot fill before their predecessor
            mask = et == st
            if lo is not None:
                mask &= vals >= lo
            if hi is not None:
                mask &= vals <= hi
            if i > 0:
                mask &= m > times[i - 1]
                if gap_us is not None:
                    mask &= m - times[i - 1] <= gap_us
            cand = m[mask]
            if cand.size:
                times[i] = int(cand.min())
    state.update(tuple(times))
    out = {"user_id": [user_id]}
    for i, st in enumerate(step_types):
        out[f"__t{i}"] = [pd.Timestamp(times[i], unit="us") if times[i] is not None else pd.NaT]
    yield pd.DataFrame(out)


def stateful_funnel(
    events: DataFrame,
    steps: list,
    max_gap_seconds: int | None = None,
    value_col: str = "value",
) -> DataFrame:
    """Streaming twin of operators/funnel.py::funnel_times for the
    restricted portable step form: per-user state is N longs (the
    earliest qualifying time of each step so far); each micro-batch
    folds its events in and emits the user's current step-time row
    (update mode — downstream keeps the latest row per user). Strict
    ordering and the optional conversion window match the batch
    operator; equivalence holds when per-user arrival order matches
    event time (in-order greedy step times are final — a later event can
    never improve an earlier step), the same append-mode contract as
    stateful_debounce.

    Steps accept either (name, event_type) pairs or the SAME dict specs
    operators/funnel.py::compile_funnel_steps compiles for batch —
    {"name", "event_type", optional "min_value"/"max_value"} — so one
    funnel config drives both engines (r7 VERDICT #4). Arbitrary Column
    predicates remain batch-only: a state fold can evaluate equality and
    value bounds per row, not SQL. NOTE the one-event-one-step rule: an
    event matches the FIRST open step only, which equals batch semantics
    whenever step event types are distinct (enforced)."""
    norm: list[tuple[str, str, float | None, float | None]] = []
    for s in steps:
        if isinstance(s, dict):
            if "event_type" not in s or "name" not in s:
                raise ValueError(f"funnel step needs name + event_type: {s!r}")
            norm.append(
                (
                    s["name"],
                    s["event_type"],
                    float(s["min_value"]) if s.get("min_value") is not None else None,
                    float(s["max_value"]) if s.get("max_value") is not None else None,
                )
            )
        else:
            name, etype = s
            norm.append((name, etype, None, None))
    names = [n for n, *_ in norm]
    types = [t for _, t, _, _ in norm]
    if len(set(names)) != len(names) or len(set(types)) != len(types):
        raise ValueError("funnel steps need distinct names and event types")
    compiled = [(t, lo, hi) for _, t, lo, hi in norm]
    out_schema = _funnel_output_schema(names)
    state_schema = T.StructType(
        [T.StructField(f"t{i}", T.LongType()) for i in range(len(norm))]
    )

    def fn(key, pdfs, state):
        for pdf in _funnel_group(
            key, pdfs, state, compiled, max_gap_seconds, value_col
        ):
            yield pdf.rename(
                columns={f"__t{i}": f"t_{n}" for i, n in enumerate(names)}
            )

    return events.groupBy("user_id").applyInPandasWithState(
        fn,
        outputStructType=out_schema,
        stateStructType=state_schema,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


TRANSITION_OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("from_type", T.StringType()),
        T.StructField("to_type", T.StringType()),
    ]
)

TRANSITION_STATE_SCHEMA = T.StructType(
    [
        T.StructField("last_ts", T.LongType()),
        T.StructField("last_type", T.StringType()),
    ]
)


def _transitions_group(
    key: Tuple[Any, ...],
    pdfs: Iterator[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    (user_id,) = key
    last_ts, last_type = state.get if state.exists else (None, None)
    parts = [pdf for pdf in pdfs if len(pdf)]
    if not parts:
        return
    batch = (
        pd.concat(parts).sort_values(["ts", "event_id"]).reset_index(drop=True)
    )
    types = batch["event_type"].to_numpy()
    m = batch["ts"].to_numpy(dtype="datetime64[ns]").astype("int64") // 1000
    # vectorized bigram: previous-event type per row, with the carried
    # state standing in for row -1 (the cross-batch boundary transition
    # a naive per-batch lag window would lose)
    prev = np.empty(types.shape, dtype=object)
    prev[1:] = types[:-1]
    prev[0] = last_type
    mask = prev != None  # noqa: E711 — elementwise against object array
    if mask.any():
        yield pd.DataFrame(
            {
                "user_id": user_id,
                "from_type": prev[mask],
                "to_type": types[mask],
            }
        )
    state.update((int(m[-1]), str(types[-1])))


def stateful_transitions(events: DataFrame) -> DataFrame:
    """Streaming twin of queries/behavior_q.py::event_transition_matrix's
    bigram extraction: per-user state is ONE (last_ts, last_type) pair,
    and each micro-batch emits its event-type transitions INCLUDING the
    batch-boundary bigram the carried state supplies (a per-batch lag
    window would silently drop one transition per user per batch).
    Downstream, counts are mergeable by addition — aggregate the emitted
    rows per micro-batch and fold into a store (same shape as
    streaming/rollup.py), or feed a streaming groupBy count. Append-mode
    contract: per-user arrival order must match event time."""
    return events.groupBy("user_id").applyInPandasWithState(
        _transitions_group,
        outputStructType=TRANSITION_OUTPUT_SCHEMA,
        stateStructType=TRANSITION_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


PIT_ENRICH_OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("fact_id", T.LongType()),
        T.StructField("k", T.LongType()),
        T.StructField("ts", T.TimestampType()),
        T.StructField("attr", T.StringType()),
    ]
)

PIT_ENRICH_STATE_SCHEMA = T.StructType(
    [
        T.StructField("last_ts", T.LongType()),
        T.StructField("last_attr", T.StringType()),
    ]
)


def _pit_enrich_group(
    key: Tuple[Any, ...],
    pdfs: Iterator[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    (k,) = key
    last_ts, last_attr = state.get if state.exists else (None, None)
    parts = [pdf for pdf in pdfs if len(pdf)]
    if not parts:
        return
    # changes sort BEFORE facts at the same instant (inclusive
    # valid_from — identical tie rule to the batch pit_join carry)
    batch = (
        pd.concat(parts)
        .sort_values(["ts", "is_change", "fact_id"], ascending=[True, False, True])
        .reset_index(drop=True)
    )
    is_change = batch["is_change"].to_numpy() == 1
    attrs = batch["attr"].to_numpy(dtype=object)
    # vectorized forward-fill of the change rows' attrs onto the rows
    # that follow them, seeded by the carried state
    src = np.where(is_change, np.arange(len(batch)), -1)
    np.maximum.accumulate(src, out=src)
    fill = np.where(src >= 0, attrs[np.clip(src, 0, None)], last_attr)
    facts = ~is_change
    if facts.any():
        fact_rows = batch[facts]
        yield pd.DataFrame(
            {
                # change rows may carry a null fact_id, which floats the
                # whole pandas column — re-anchor the fact slice to int64
                "fact_id": fact_rows["fact_id"].astype("int64").to_numpy(),
                "k": k,
                "ts": fact_rows["ts"].to_numpy(),
                "attr": fill[facts],
            }
        )
    if is_change.any():
        m = batch["ts"].to_numpy(dtype="datetime64[ns]").astype("int64") // 1000
        idx = int(np.flatnonzero(is_change)[-1])
        last_ts, last_attr = int(m[idx]), attrs[idx]
    state.update((last_ts, last_attr))


def streaming_pit_enrich(tagged: DataFrame) -> DataFrame:
    """Streaming twin of operators/scd.py::pit_join for a merged
    CDC+facts stream: rows carry (k, ts, is_change, attr, fact_id); the
    per-key state is ONE (last_ts, last_attr) pair, change rows update
    it in event order, and every fact row emits enriched with the
    attribute in effect at its timestamp — changes at the same instant
    win (inclusive valid_from), matching the batch carry's tie rule.
    Adapt other schemas by select()ing into this shape (the same
    single-attribute simplification as the stateful funnel's portable
    steps). Append-mode contract: per-key arrival order must match event
    time — the upstream merge of the CDC and fact topics must be
    time-ordered per key."""
    return tagged.groupBy("k").applyInPandasWithState(
        _pit_enrich_group,
        outputStructType=PIT_ENRICH_OUTPUT_SCHEMA,
        stateStructType=PIT_ENRICH_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


from etl_poc_spark._serde import register_by_value as _rbv  # noqa: E402

_rbv(__name__)
