"""Custom stateful streaming operators via ``applyInPandasWithState``.

The reference has no streaming at all (SURVEY §2.3); this is the
engine-extension path for operators the built-in windowed aggregates
can't express: arbitrary per-key state machines.

``first_event_per_key``: streaming deduplication — emit only the first
event seen for each (user_id, event_type), across all micro-batches.
State = one flag per key; batch-internal ordering is resolved by
(ts, event_id) min, so output is deterministic regardless of how the
source splits batches.

Scale: state is one tiny row per distinct key in the state store;
with a watermark + timeout the store stays bounded for evolving key
domains (finite here, so NoTimeout).
"""

from __future__ import annotations

from collections.abc import Iterable, Iterator
from typing import Any

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUTPUT_SCHEMA = "user_id bigint, event_type string, event_id bigint, ts timestamp"
STATE_SCHEMA = "seen boolean"


def _first_event_fn(
    key: tuple[Any, ...], pdfs: Iterable[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    if state.exists:
        return
    batch = pd.concat(list(pdfs), ignore_index=True)
    if batch.empty:
        return
    first = batch.sort_values(["ts", "event_id"], kind="mergesort").iloc[0]
    state.update((True,))
    yield pd.DataFrame(
        {
            "user_id": [key[0]],
            "event_type": [key[1]],
            "event_id": [first["event_id"]],
            "ts": [first["ts"]],
        }
    )


def first_event_per_key(events: DataFrame) -> DataFrame:
    """events must be a streaming DataFrame with user_id/event_type/
    event_id/ts columns."""
    return (
        events.groupBy("user_id", "event_type")
        .applyInPandasWithState(
            _first_event_fn,
            outputStructType=OUTPUT_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


# A transformWithStateInPandas twin (named-ValueState state machine on
# the Spark 4 state API) lived here through round 4; it was retired in
# round 5 because its state-server protocol needs google.protobuf,
# absent from this image — see plans/streaming_plans.py. Recover the
# implementation from git history for protobuf-capable runtimes.
