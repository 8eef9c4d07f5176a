"""Custom stateful streaming operators (applyInPandasWithState).

The built-in streaming aggregations (window/session_window/dedup in
kaylee_spark/streaming) cover everything the reference's algebra can
express; this module is the escape hatch for state the built-ins can't
model — arbitrary per-key accumulators updated batch-by-batch, the
streaming analogue of the reference's holistic reducefn
(`/root/reference/kaylee/client.py:204-217` hands the reducer the full
value iterator; here the iterator arrives incrementally across
micro-batches and state carries the running fold).

Scale notes: state lives in the state store keyed by group — per-key
size here is O(1) (two scalars), so state growth is bounded by key
cardinality, not event volume. With no timeout, keys live forever; at
100 TB use a ProcessingTimeTimeout + state.remove() for retiring keys.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def user_running_totals(events: DataFrame) -> DataFrame:
    """Per-user running (event count, value total), emitted per batch.

    Each micro-batch updates the user's accumulator and emits the new
    running totals (output mode "update"); after the stream drains, the
    LAST emission per user equals the batch groupBy aggregate — the
    unified-semantics check asserted in tests/test_streaming.py.
    """
    import pandas as pd
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    out_schema = "user_id long, n_events long, total_value double"
    state_schema = "n long, total double"

    def fold(key, pdfs, state: GroupState):
        n, total = state.get if state.exists else (0, 0.0)
        for pdf in pdfs:
            n += len(pdf)
            total += float(pdf["value"].sum())
        state.update((n, total))
        yield pd.DataFrame({"user_id": [key[0]], "n_events": [n], "total_value": [total]})

    return events.groupBy("user_id").applyInPandasWithState(
        fold, out_schema, state_schema, "update", GroupStateTimeout.NoTimeout
    )


def last_touch_state(
    events: DataFrame,
    touch_types: tuple[str, ...] = ("click", "view"),
    conversion_type: str = "purchase",
    lookback_seconds: int = 7 * 86400,
) -> DataFrame:
    """Streamed last-touch attribution: per-user state carries the most
    recent touch (ts, channel); every conversion is attributed the
    moment it arrives and emitted APPEND-mode (rows are final — the
    attribution of a purchase can never change once its event time has
    passed, because a touch after it cannot precede it).

    ORDER CONTRACT: correctness needs per-user events processed in
    (ts, tiebreak) order. Within a batch the group's rows are sorted
    explicitly; across batches the staged file source delivers
    contiguous oldest-first time slices (stage_events_dir — boundary
    ties stay inside one slice), so batch k+1 carries no event earlier
    than batch k. Under that contract the emitted rows equal the batch
    operator's strictly-before window carry row-for-row (hash-checked
    through e34's shared oracle).

    State is O(1) per user (epoch-micros long + channel string); at
    100 TB add a ProcessingTimeTimeout to retire idle users — the
    lookback makes touches older than ``lookback_seconds`` dead state.
    """
    import pandas as pd
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    out_schema = "user_id long, ts timestamp, channel string, value double"
    state_schema = "touch_us long, channel string"
    touches = set(touch_types)
    lookback_us = int(lookback_seconds) * 1_000_000

    def fold(key, pdfs, state: GroupState):
        touch_us, channel = state.get if state.exists else (None, None)
        out = []
        batch = pd.concat(list(pdfs), ignore_index=True)
        batch = batch.sort_values(["ts", "event_id"], kind="mergesort")
        for ts, ev_type, value in zip(batch["ts"], batch["event_type"], batch["value"]):
            ts_us = int(pd.Timestamp(ts).value // 1000)
            if ev_type == conversion_type:
                ch = (
                    channel
                    if touch_us is not None and ts_us - touch_us <= lookback_us
                    else "direct"
                )
                # NULL conversion values must stay NULL: float(NaN)
                # would diverge from the batch twin, whose dec_sum
                # skips NULLs (ADVICE r11).
                out.append((key[0], ts, ch, None if pd.isna(value) else float(value)))
            if ev_type in touches:
                touch_us, channel = ts_us, ev_type
        if touch_us is not None:
            state.update((touch_us, channel))
        yield pd.DataFrame(out, columns=["user_id", "ts", "channel", "value"])

    return events.groupBy("user_id").applyInPandasWithState(
        fold, out_schema, state_schema, "append", GroupStateTimeout.NoTimeout
    )
