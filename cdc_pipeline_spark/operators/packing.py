"""Training-sequence packing: assign documents to fixed-token-budget
packs.

LLM training batches concatenate documents into fixed-length sequences;
the pipeline step is "give every document a pack id such that packs are
filled in a deterministic order". This implements offset packing: within
each partition group, documents are laid out in a deterministic order,
and a document belongs to the pack where its START offset falls
(running-sum window → integer-divide by the budget). Documents larger
than the budget simply span packs — the trainer's concat+chunk step
handles splitting; the pipeline's job is the deterministic layout.

Scale: the window partitions by ``partition_cols`` (e.g. source shard),
so the running sum is per-group and distributes; a GLOBAL ordered pack
layout would serialize into one task — at 100 TB partition by a stable
shard key and treat pack ids as (shard, local_pack). One shuffle on the
partition key, whole-stage-codegen arithmetic after.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def pack_sequences(
    df: DataFrame,
    token_count_col: str,
    budget: int,
    partition_cols: Sequence[str],
    order_cols: Sequence[str],
    pack_col: str = "pack_id",
) -> DataFrame:
    """Adds ``pack_col``: 0-based pack index within each partition group,
    by start-offset of the document in the group's deterministic layout
    (ordered by ``order_cols``, which must be a total order per group).
    Integer arithmetic throughout — engine-portable (no double division).
    """
    if budget <= 0:
        raise ValueError(f"budget must be positive, got {budget}")
    w = (
        Window.partitionBy(*partition_cols)
        .orderBy(*order_cols)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    cum = F.sum(F.col(token_count_col).cast("long")).over(w)
    return (
        df.withColumn("__start", cum - F.col(token_count_col).cast("long"))
        # integer division (SQL DIV): engine-portable, no double rounding
        .withColumn(pack_col, F.expr(f"__start DIV {int(budget)}"))
        .drop("__start")
    )
