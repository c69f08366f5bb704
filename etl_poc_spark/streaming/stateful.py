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
    rows = []
    for pdf in pdfs:
        for ts in sorted(pdf["ts"]):
            micros = int(ts.value // 1000)  # pandas ns -> micros
            if last is None or micros - last > gap_seconds * 1_000_000:
                if last is not None:
                    rows.append((user_id, start, last, n))  # close previous session
                start, n = micros, 0
            last = micros
            n += 1
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
    keep = []
    for pdf in pdfs:
        for _, row in pdf.sort_values(["ts", "event_id"]).iterrows():
            micros = int(row["ts"].value // 1000)
            if last is None or micros - last >= within_seconds * 1_000_000:
                keep.append((int(row["event_id"]), row["ts"]))
            # lag-vs-previous-EVENT (kept or not) — identical to the
            # batch operators/funnel.py::debounce_flag formulation
            last = micros
    state.update((last,))
    state.setTimeoutDuration(within_seconds * 1000)
    if keep:
        yield pd.DataFrame(
            {
                "event_id": [k[0] for k in keep],
                "user_id": user_id,
                "event_type": event_type,
                "ts": [k[1] for k in keep],
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
    step_types: list[str],
    max_gap_seconds: int | None,
) -> Iterator[pd.DataFrame]:
    (user_id,) = key
    n = len(step_types)
    times = list(state.get) if state.exists else [None] * n
    for pdf in pdfs:
        for _, row in pdf.sort_values(["ts", "event_id"]).iterrows():
            micros = int(row["ts"].value // 1000)
            et = row["event_type"]
            for i, st in enumerate(step_types):
                if times[i] is not None or et != st:
                    continue
                if i == 0:
                    times[i] = micros
                elif times[i - 1] is not None and micros > times[i - 1]:
                    if (
                        max_gap_seconds is None
                        or micros - times[i - 1] <= max_gap_seconds * 1_000_000
                    ):
                        times[i] = micros
                break  # an event advances at most one step (first open match)
    state.update(tuple(times))
    out = {"user_id": [user_id]}
    for i, st in enumerate(step_types):
        out[f"__t{i}"] = [pd.Timestamp(times[i], unit="us") if times[i] is not None else pd.NaT]
    yield pd.DataFrame(out)


def stateful_funnel(
    events: DataFrame,
    steps: list[tuple[str, str]],
    max_gap_seconds: int | None = None,
) -> DataFrame:
    """Streaming twin of operators/funnel.py::funnel_times for
    event-type-equality steps: per-user state is N longs (the earliest
    qualifying time of each step so far); each micro-batch folds its
    events in and emits the user's current step-time row (update mode —
    downstream keeps the latest row per user). Strict ordering and the
    optional conversion window match the batch operator; equivalence
    holds when per-user arrival order matches event time (in-order
    greedy step times are final — a later event can never improve an
    earlier step), the same append-mode contract as stateful_debounce.

    Unlike the batch operator's arbitrary Column predicates, steps here
    are (name, event_type) pairs — the predicate form a state fold can
    evaluate per row. NOTE the one-event-one-step rule: an event matches
    the FIRST open step only, which equals batch semantics whenever step
    event types are distinct (enforced)."""
    names = [n for n, _ in steps]
    types = [t for _, t in steps]
    if len(set(names)) != len(names) or len(set(types)) != len(types):
        raise ValueError("funnel steps need distinct names and event types")
    out_schema = _funnel_output_schema(names)
    state_schema = T.StructType(
        [T.StructField(f"t{i}", T.LongType()) for i in range(len(steps))]
    )

    def fn(key, pdfs, state):
        for pdf in _funnel_group(key, pdfs, state, types, max_gap_seconds):
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


from etl_poc_spark._serde import register_by_value as _rbv  # noqa: E402

_rbv(__name__)
