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
