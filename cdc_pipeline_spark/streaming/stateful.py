"""Custom stateful streaming operators.

Consecutive-breach alerting: the reference DESIGNED an N-consecutive-
breach alert state machine (Normal→Pending→Firing,
``DESCRIPTION.md:1246-1265``, vestigial sketch ``redis_sink.py:32-49``)
but never built it — its shipped alerts are stateless per-batch
threshold checks (kpi_aggregator.py:105-143). This module builds the
designed semantics with ``applyInPandasWithState``: state is one
(count, status) pair per rule key, grouped state lives in the state
store (checkpointed, partitioned by key — scales with #rules, not
#events).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

ALERT_OUTPUT_SCHEMA = StructType(
    [
        StructField("rule_id", StringType()),
        StructField("consecutive_breaches", IntegerType()),
        StructField("status", StringType()),
        StructField("last_observed_epoch", LongType()),
    ]
)

ALERT_STATE_SCHEMA = StructType(
    [
        StructField("count", IntegerType()),
        StructField("status", StringType()),
    ]
)


def consecutive_breach_alerts(
    evaluated: DataFrame,
    n_breaches: int = 3,
    rule_col: str = "rule_id",
    status_col: str = "status",
    time_col: str = "window_end",
) -> DataFrame:
    """Normal→Pending→Firing state machine over a per-window rule-status
    stream (output of operators.aggregates.alert_frame applied to
    windowed metrics).

    Input rows: (rule_id, status ∈ {ok, firing}, window_end epoch...).
    Per rule key, a breach row increments the counter, an ok row resets
    it; status becomes 'firing' only at ≥ n_breaches consecutive
    breaches, 'pending' below that, 'normal' on ok.
    """

    def update(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        (rule_id,) = key
        count, status = state.get if state.exists else (0, "normal")
        last_epoch = 0
        # A key's rows can span multiple Arrow chunks of the iterator —
        # concatenate first, THEN sort, or the fold would process the
        # breach/ok sequence out of time order across chunk boundaries.
        chunks = list(pdfs)
        if chunks:
            all_rows = pd.concat(chunks, ignore_index=True).sort_values(time_col)
            for _, row in all_rows.iterrows():
                last_epoch = int(row[time_col])
                if row[status_col] == "firing":
                    count += 1
                    status = "firing" if count >= n_breaches else "pending"
                else:
                    count = 0
                    status = "normal"
        state.update((count, status))
        yield pd.DataFrame(
            {
                "rule_id": [rule_id],
                "consecutive_breaches": [count],
                "status": [status],
                "last_observed_epoch": [last_epoch],
            }
        )

    return evaluated.groupBy(rule_col).applyInPandasWithState(
        update,
        outputStructType=ALERT_OUTPUT_SCHEMA,
        stateStructType=ALERT_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
