"""Continuous-aggregate maintenance: a streaming-updated rollup table.

The batch side (`workload.events_multigrain_rollup`) shows the grain
hierarchy: 5-minute partials → hour → day, each level re-aggregated
from the one below. This module maintains the FINEST grain from a
stream so the whole hierarchy stays queryable without ever re-scanning
raw history — the reference's fixed 30s/10s dashboards are the finest
grain of exactly this pattern, but its state lives only in Redis
snapshots; here the partials are a durable, mergeable table.

Exactly-once without a transaction log: each micro-batch writes its
partial rows under ``batch_id=<n>`` (one hive partition per batch), so
an at-least-once foreachBatch replay overwrites ITS OWN partition and
nothing else — idempotence by layout, the same trick as checkpoint
file sinks. Readers merge partials with a mergeable aggregate (counts
and DECIMAL sums — fold-order-free), so a half-written replay is at
worst a torn read of one batch, never a double count after it lands.

Scale: per-batch write volume is |distinct 5-min buckets in the batch|
rows — bounded by watermark span, independent of table size. Partial
files accumulate one dir per batch; fold them periodically with
``compact_partials`` (same maintenance cadence as SCD2 retention).
"""

from __future__ import annotations

import contextlib
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

__all__ = [
    "RollupTableWriter",
    "read_rollup",
    "compact_partials",
    "HistogramRollupWriter",
    "read_histogram_rollup",
    "compact_histogram_partials",
    "GramRollupWriter",
    "read_gram_rollup",
    "compact_gram_partials",
]

_GRAIN_SECONDS = {"5min": 300, "hour": 3600, "day": 86400}


class RollupTableWriter:
    """``foreachBatch`` writer maintaining 5-minute partials at ``path``.

    ``run_id`` names the streaming-checkpoint generation this writer
    belongs to (pass the checkpoint path or a uuid stored beside it).
    The replay guard — skipping batch ids the compaction marker says
    were already folded — applies ONLY within the same run_id: batch ids
    restart at 0 whenever a checkpoint is recreated, and a guard keyed
    on the raw id would silently drop the new run's first batches.
    Before pointing a NEW checkpoint at an existing rollup table, run
    :func:`compact_partials` (with the new run_id) so stale per-batch
    partitions can't collide with the new run's restarted ids."""

    def __init__(
        self,
        path: str,
        time_col: str = "ts",
        value_col: str = "value",
        grain_seconds: int = 300,
        run_id: str = "",
    ) -> None:
        self.path = path
        self.time_col = time_col
        self.value_col = value_col
        self.grain_seconds = grain_seconds
        self.run_id = run_id

    def __call__(self, batch_df: DataFrame, batch_id: int) -> None:
        partials = (
            batch_df.groupBy(
                (
                    F.floor(F.col(self.time_col).cast("long") / self.grain_seconds)
                    * self.grain_seconds
                )
                .cast("long")
                .alias("bucket_start")
            )
            .agg(
                F.count(F.lit(1)).alias("n_events"),
                F.sum(F.col(self.value_col))
                .cast("decimal(28,2)")
                .alias("v"),
            )
            .withColumn("batch_id", F.lit(int(batch_id)))
        )
        # overwrite THIS batch's partition only → replay-idempotent;
        # the table lock keeps the write out of a compaction's dir swap
        with _table_lock(self.path):
            if _replay_folded(self.path, self.run_id, batch_id):
                return
            _write_partials(partials, self.path)


def read_rollup(spark: SparkSession, path: str, grain: str = "5min") -> DataFrame:
    """Merge the partials up to the requested grain: (bucket_start,
    n_events, sum_value). Counts and decimal sums are mergeable, so the
    result is independent of how many batches contributed to a bucket."""
    seconds = _GRAIN_SECONDS[grain]
    partials = spark.read.parquet(path)
    return (
        partials.groupBy(
            (F.floor(F.col("bucket_start") / seconds) * seconds).cast("long").alias("bucket_start")
        )
        .agg(
            F.sum("n_events").cast("long").alias("n_events"),
            F.sum("v").cast("decimal(28,2)").alias("sum_value"),
        )
    )


_COMPACTION_MARKER = "_compaction.json"
_LOCK_SUFFIX = ".compact.lock"
_LOCK_STALE_SECONDS = 600.0


def _replay_folded(path: str, run_id: str, batch_id: int) -> bool:
    """foreachBatch is at-least-once: a batch replayed AFTER compaction
    folded it into ``batch_id=-1`` would re-create its partition and
    double-count on merge — skip ids the marker says are folded, but
    only for THIS run's id sequence (batch ids restart at 0 when a
    checkpoint is recreated). MUST be called while holding the table
    lock: checking the marker before acquiring it races a concurrent
    compaction (the fold lands and advances the marker between the
    check and the write — the classic TOCTOU the lock exists to stop).
    """
    through, marker_run = _compaction_state(path)
    return marker_run == run_id and int(batch_id) <= through


def _write_partials(partials: DataFrame, path: str) -> None:
    """Overwrite exactly this batch's ``batch_id=<n>`` partition.

    The dynamic-overwrite mode rides on the WRITER (per-write option),
    not the session conf: a session-level temp_conf here raced other
    concurrent foreachBatch writers on the same SparkSession — one
    writer's restore could downgrade another's in-flight overwrite to
    static mode, which deletes every existing partition of that table.
    """
    (
        partials.coalesce(1)
        .write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy("batch_id")
        .parquet(path)
    )


@contextlib.contextmanager
def _table_lock(path: str, timeout: float = 30.0):
    """Cross-process mutual exclusion between the per-batch partial
    writers and compaction, via an O_EXCL sidecar lock file.

    Compaction rename-aside swaps the whole table directory; a partial
    write landing mid-swap would vanish with the ``.old`` dir. The
    writers hold this lock for one partition write (fast), compaction
    for the fold+swap — so "run compaction from the maintenance
    cadence, not per micro-batch" is now ENFORCED rather than advised:
    a compaction that overlaps an active writer waits its turn, and two
    concurrent compactions serialize (the loser folds an already-folded
    table — a no-op by the marker guard).

    A lock older than ``_LOCK_STALE_SECONDS`` is presumed left by a
    crash and broken ATOMICALLY (rename-aside — two waiters cannot both
    claim the same stale lock; the rename loser just re-polls). Holders
    therefore must finish within the staleness horizon; both writer
    partition writes and compaction folds are seconds, not minutes. On
    timeout the caller gets a RuntimeError rather than a silent
    corruption window. Release checks an owner token so a breaker's
    fresh lock is never unlinked by the stale holder's cleanup.
    """
    import time
    import uuid

    lock = path.rstrip("/") + _LOCK_SUFFIX
    parent = os.path.dirname(lock)
    if parent:
        # before the table's first write nothing has created the parent
        # (Spark's writer does it lazily) — the lock must not be the
        # thing that crashes the first micro-batch
        os.makedirs(parent, exist_ok=True)
    token = f"{os.getpid()}:{uuid.uuid4().hex}"
    deadline = time.time() + timeout
    while True:
        try:
            fd = os.open(lock, os.O_CREAT | os.O_EXCL | os.O_WRONLY)
            os.write(fd, token.encode())
            os.close(fd)
            break
        except FileExistsError:
            # deadline is checked FIRST so every branch below (stale
            # break failing persistently, stat races) still terminates
            # in the promised RuntimeError instead of spinning forever
            if time.time() > deadline:
                raise RuntimeError(
                    f"rollup table {path} is locked by another writer/compaction "
                    f"({lock}); retry from the maintenance cadence"
                )
            try:
                stale = time.time() - os.path.getmtime(lock) > _LOCK_STALE_SECONDS
            except OSError:
                time.sleep(0.05)  # holder released between check and stat
                continue
            if stale:
                # atomic break: exactly one waiter wins the rename; the
                # loser's rename raises and it simply re-polls
                try:
                    os.rename(lock, f"{lock}.broken.{token}")
                    os.unlink(f"{lock}.broken.{token}")
                except OSError:
                    time.sleep(0.05)
                continue
            time.sleep(0.1)
    # heartbeat: refresh the lock mtime while held so a write that
    # legitimately outlives _LOCK_STALE_SECONDS (stalled executors,
    # skewed micro-batch) is not declared stale and broken mid-write —
    # the staleness horizon now only fires on genuinely dead holders
    import threading

    stop_beat = threading.Event()

    def _beat() -> None:
        while not stop_beat.wait(_LOCK_STALE_SECONDS / 10):
            try:
                os.utime(lock)
            except OSError:
                return  # lock gone (broken/released) — stop quietly

    beater = threading.Thread(target=_beat, daemon=True)
    beater.start()
    try:
        yield
    finally:
        stop_beat.set()
        beater.join(timeout=1.0)
        try:
            # only release OUR lock: if a breaker replaced it after
            # declaring us stale, the file now carries their token
            with open(lock) as fh:
                if fh.read() == token:
                    os.unlink(lock)
        except OSError:
            pass


def _compaction_state(path: str) -> tuple[int, str]:
    """(highest folded batch_id, run_id it applies to) — (-1, "") when
    never compacted. Stored in an underscore-prefixed sidecar file,
    which Spark/Hadoop parquet listings ignore."""
    import json

    marker = os.path.join(path, _COMPACTION_MARKER)
    try:
        with open(marker) as fh:
            data = json.load(fh)
        return int(data["compacted_through"]), str(data.get("run_id", ""))
    except (OSError, ValueError, KeyError, TypeError):
        # TypeError: valid-JSON-but-not-a-dict marker (truncated or
        # hand-edited) must degrade to "never compacted" like every
        # other corruption shape, not crash the streaming query
        return -1, ""


def compact_partials(
    spark: SparkSession, path: str, run_id: str = "", lock_timeout: float = 30.0
) -> int:
    """Fold all per-batch partials into one ``batch_id=-1`` partition
    (merging by bucket), dropping the per-batch dirs. Returns the number
    of partial rows after compaction. Run from the maintenance cadence —
    readers are correct before and after, this only bounds file count.

    Crash safety: the fold writes to a ``.compact.tmp`` sibling, then the
    old table is renamed ASIDE before the tmp dir takes its place — a
    crash at any point leaves a complete table at either ``path`` or
    ``path.old`` (never neither, which a naive rmtree-then-rename risks).
    Replay safety: the highest folded batch_id is recorded in a marker
    the writer consults, so an at-least-once foreachBatch replay of an
    already-folded batch cannot re-create its partition and double-count.
    Concurrent readers mid-swap can transiently error on the rename (a
    lakehouse table format turns this into an atomic metadata commit);
    run it from the maintenance cadence, not per micro-batch."""
    with _table_lock(path, timeout=lock_timeout):
        partials = spark.read.parquet(path)
        folded = (
            partials.groupBy("bucket_start")
            .agg(
                F.sum("n_events").alias("n_events"),
                F.sum("v").cast("decimal(28,2)").alias("v"),
            )
            .withColumn("batch_id", F.lit(-1))
        )
        return _swap_compacted(spark, path, partials, folded, run_id)


def _swap_compacted(
    spark: SparkSession, path: str, partials: DataFrame, folded: DataFrame, run_id: str
) -> int:
    """Shared compaction tail: write the fold to a tmp sibling, record
    the replay-guard marker (highest folded batch_id, run-scoped), then
    rename-aside swap. See compact_partials' docstring for the crash
    and replay analysis."""
    import json
    import shutil

    high = partials.agg(F.max("batch_id")).collect()[0][0]
    high = int(high) if high is not None else -1
    tmp = path.rstrip("/") + ".compact.tmp"
    folded.coalesce(1).write.mode("overwrite").partitionBy("batch_id").parquet(tmp)
    n = spark.read.parquet(tmp).count()
    prev_through, prev_run = _compaction_state(path)
    with open(os.path.join(tmp, _COMPACTION_MARKER), "w") as fh:
        json.dump(
            {
                # the guard window only carries over within the same run's
                # id sequence; a new run starts its own watermark
                "compacted_through": max(high, prev_through) if prev_run == run_id else high,
                "run_id": run_id,
            },
            fh,
        )
    old = path.rstrip("/") + ".old"
    if os.path.isdir(old):
        shutil.rmtree(old)
    os.rename(path, old)
    os.rename(tmp, path)
    shutil.rmtree(old)
    return n


class HistogramRollupWriter:
    """``foreachBatch`` writer maintaining histogram-sketch partials:
    each micro-batch appends its (group_cols..., bin, n) counts under
    ``batch_id=<n>`` — the same idempotence-by-layout and run-scoped
    replay guard as :class:`RollupTableWriter`. Bin counts are additive,
    so readers merge partials exactly (no quantization caveat at all)
    and :func:`cdc_pipeline_spark.operators.sketches.
    percentiles_from_bin_counts` serves percentiles from the merged
    state — a continuously-maintained approximate-percentile table
    whose per-batch write volume is ≤ n_bins rows per group.

    Compaction: :func:`compact_histogram_partials` — same marker and
    rename-aside swap as the time rollup, so a replay of an
    already-folded batch is skipped by the guard above. (Folding to a
    fresh path by hand would lose the marker and double-count a
    replayed batch.)"""

    def __init__(
        self,
        path: str,
        value_col: str,
        lo: float,
        hi: float,
        n_bins: int,
        group_cols: tuple[str, ...] = (),
        run_id: str = "",
    ) -> None:
        self.path = path
        self.value_col = value_col
        self.lo = float(lo)
        self.width = (float(hi) - float(lo)) / n_bins
        self.n_bins = n_bins
        self.group_cols = tuple(group_cols)
        self.run_id = run_id

    def __call__(self, batch_df: DataFrame, batch_id: int) -> None:
        from cdc_pipeline_spark.operators.sketches import histogram_bin

        partials = (
            batch_df.filter(F.col(self.value_col).isNotNull())
            .groupBy(
                *self.group_cols,
                histogram_bin(
                    F.col(self.value_col), self.lo, self.width, self.n_bins
                ).alias("bin"),
            )
            .agg(F.count(F.lit(1)).alias("n"))
            .withColumn("batch_id", F.lit(int(batch_id)))
        )
        # same table lock as RollupTableWriter: a partial landing inside
        # compaction's rename-aside swap would vanish with the .old dir
        with _table_lock(self.path):
            if _replay_folded(self.path, self.run_id, batch_id):
                return
            _write_partials(partials, self.path)


def read_histogram_rollup(
    spark: SparkSession, path: str, group_cols: tuple[str, ...] = ()
) -> DataFrame:
    """Merge histogram partials to (group_cols..., bin, n) — exact
    regardless of batch layout (integer sums). Feed to
    ``percentiles_from_bin_counts`` for serving."""
    partials = spark.read.parquet(path)
    return partials.groupBy(*group_cols, "bin").agg(
        F.sum("n").cast("long").alias("n")
    )


def compact_histogram_partials(
    spark: SparkSession,
    path: str,
    group_cols: tuple[str, ...] = (),
    run_id: str = "",
    lock_timeout: float = 30.0,
) -> int:
    """Fold histogram per-batch partials into one ``batch_id=-1``
    partition (exact integer merge), with the same replay marker and
    crash-safe rename-aside swap as :func:`compact_partials` — so an
    at-least-once replay of an already-folded batch id is skipped by
    the writer's guard instead of double-counting."""
    with _table_lock(path, timeout=lock_timeout):
        partials = spark.read.parquet(path)
        folded = (
            partials.groupBy(*group_cols, "bin")
            .agg(F.sum("n").cast("long").alias("n"))
            .withColumn("batch_id", F.lit(-1))
        )
        return _swap_compacted(spark, path, partials, folded, run_id)


class GramRollupWriter:
    """``foreachBatch`` writer maintaining the exact integer Gram/
    covariance partials of an embedding stream: each micro-batch
    appends its sentinel-encoded partial rows (upper-triangle XᵀX at
    (i, j≥0), column sums at (i, −1), row count at (−1, −1) — see
    ``operators.linalg.gram_partial_rows``) under ``batch_id=<n>``,
    with the same idempotence-by-layout, run-scoped replay guard and
    table lock as the other rollup writers. Partials are ADDITIVE
    decimal(38,0) integers, so readers merge them exactly (fold-order
    free) and :func:`read_gram_rollup` assembles the same centered
    ``G = n·S − m·mᵀ`` a from-scratch batch pass would produce — a
    continuously-maintained covariance/PCA precompute whose per-batch
    write volume is ≤ d(d+1)/2 + d + 1 rows regardless of batch size.
    """

    def __init__(
        self,
        path: str,
        vec_col: str = "embedding",
        scale: int = 1 << 12,
        run_id: str = "",
    ) -> None:
        self.path = path
        self.vec_col = vec_col
        self.scale = int(scale)
        self.run_id = run_id

    def __call__(self, batch_df: DataFrame, batch_id: int) -> None:
        from cdc_pipeline_spark.operators.linalg import gram_partial_rows

        # non-finite components would corrupt the integer partials (and
        # gram_partial_rows raises on them) — a streaming writer must
        # drop such rows rather than kill the query; the count sentinel
        # reflects the rows actually folded in
        finite = batch_df.filter(
            F.col(self.vec_col).isNotNull()
            & ~F.exists(
                F.col(self.vec_col),
                lambda x: F.isnan(x.cast("double"))
                | (F.abs(x.cast("double")) == F.lit(float("inf"))),
            )
        )
        partials = (
            gram_partial_rows(finite, vec_col=self.vec_col, scale=self.scale)
            .groupBy("i", "j")
            .agg(F.sum("v").alias("v"))
            .withColumn("batch_id", F.lit(int(batch_id)))
        )
        with _table_lock(self.path):
            if _replay_folded(self.path, self.run_id, batch_id):
                return
            _write_partials(partials, self.path)


def read_gram_rollup(spark: SparkSession, path: str) -> DataFrame:
    """Merge Gram partials and assemble the centered Gram upper
    triangle (i, j, g) — exact regardless of batch layout (decimal
    integer sums), bit-equal to ``operators.linalg.quantized_gram``
    over the full history (golden-tested)."""
    from cdc_pipeline_spark.operators.linalg import assemble_centered_gram

    sums = (
        spark.read.parquet(path)
        .groupBy("i", "j")
        .agg(F.sum("v").alias("v"))
    )
    return assemble_centered_gram(sums)


def compact_gram_partials(
    spark: SparkSession,
    path: str,
    run_id: str = "",
    lock_timeout: float = 30.0,
) -> int:
    """Fold Gram per-batch partials into one ``batch_id=-1`` partition
    (exact decimal merge), with the same replay marker and crash-safe
    rename-aside swap as the other compactors."""
    with _table_lock(path, timeout=lock_timeout):
        partials = spark.read.parquet(path)
        folded = (
            partials.groupBy("i", "j")
            .agg(F.sum("v").alias("v"))
            .withColumn("batch_id", F.lit(-1))
        )
        return _swap_compacted(spark, path, partials, folded, run_id)
