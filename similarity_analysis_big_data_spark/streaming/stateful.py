"""Custom stateful streaming operator via applyInPandasWithState
(SURVEY §7 [ext] streaming state; pyspark guide's stateful pattern).

``running_user_totals``: per-user running event count + value total,
emitting one updated row per user per micro-batch — the minimal shape of a
production feature-store updater (state = one row per key, bounded by a
processing-time timeout).
"""

from __future__ import annotations

from collections.abc import Iterable

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUTPUT_SCHEMA = "user_id long, n_events long, total_value double"
STATE_SCHEMA = "n_events long, total_value double"


def _update_user(key, pdfs: Iterable[pd.DataFrame], state: GroupState):
    (user_id,) = key
    n, total = (state.get) if state.exists else (0, 0.0)
    for pdf in pdfs:
        n += len(pdf)
        total += float(pdf["value"].sum())
    state.update((n, total))
    yield pd.DataFrame({"user_id": [user_id], "n_events": [n], "total_value": [total]})


def running_user_totals(events: DataFrame) -> DataFrame:
    """Stateful per-user totals over the event stream.

    State is one (count, sum) pair per user — O(|users|) memory regardless
    of stream length; NoTimeout here because the fixture is bounded (a
    production deploy sets a processing/event-time timeout to expire idle
    keys).
    """
    return (
        events.select("user_id", "value")
        .groupBy("user_id")
        .applyInPandasWithState(
            _update_user,
            outputStructType=OUTPUT_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
