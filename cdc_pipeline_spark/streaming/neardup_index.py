"""Continuous near-duplicate detection: a streaming-maintained MinHash
LSH band index with probe-on-ingest.

`streaming/corpus_ingest.py` deliberately keeps near-dup OUT of its
hot append path and defers it to a maintenance pass; this module is
the other layering — for pipelines that must REJECT (or flag)
near-duplicates of the historical corpus at ingest time, each
micro-batch:

  1. probes its documents' band postings against the index of every
     STRICTLY EARLIER batch (incoming x history only, never history x
     history — per-batch probe cost is proportional to the batch), and
     verifies candidates with exact Jaccard against the stored shingle
     sets, landing matches >= threshold;
  2. appends its own postings + shingle sets to the index.

Storage layout mirrors `streaming/rollup.py`: three parquet tables
under ``path`` (``postings/``, ``shingles/``, ``matches/``), each
partitioned by ``batch_id`` with per-batch dynamic-partition
overwrite — a replayed micro-batch rewrites exactly its own partition,
and because the probe reads only ``batch_id < current``, the replay
re-derives the SAME matches (its own postings are excluded), so the
whole operator is replay-idempotent with no marker files.

At 100 TB: postings are (band, bucket, doc_id) — `bands` rows/doc —
and the probe is a band-bucket equi-join, so bucketing ``postings/``
by (band, bucket) makes each increment's probe shuffle-free on the
corpus side; `max_bucket` caps hot boilerplate buckets exactly as in
`dedup.prune_hot_buckets`. The batch twin is
`dedup.incremental_minhash_neardup`, and the golden test pins
stream-maintained matches == the batch twin run per increment.
"""

from __future__ import annotations

import os

from pyspark.errors import AnalysisException
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from cdc_pipeline_spark.operators.dedup import (
    _shingled,
    band_posting,
    minhash_signatures,
    prune_hot_buckets,
)
from cdc_pipeline_spark.operators.rounding import round_half_up


class NearDupIndexWriter:
    """``foreachBatch`` writer: probe-then-append continuous near-dup.

    Call with ``(batch_df, batch_id)``; ``batch_df`` needs
    ``(id_col, text_col)``. Matches land under ``<path>/matches/`` as
    (doc_id [incoming], match_id [historical], jaccard, batch_id).
    """

    def __init__(
        self,
        path: str,
        id_col: str = "doc_id",
        text_col: str = "text",
        n: int = 3,
        num_perm: int = 64,
        bands: int = 16,
        threshold: float = 0.5,
        max_bucket: int | None = None,
        run_id: str = "",
    ) -> None:
        if num_perm % bands:
            raise ValueError(f"bands={bands} must divide num_perm={num_perm}")
        self.path = path
        self.id_col = id_col
        self.text_col = text_col
        self.n = n
        self.num_perm = num_perm
        self.bands = bands
        self.threshold = threshold
        self.max_bucket = max_bucket
        self.run_id = run_id

    def _sub(self, name: str) -> str:
        return os.path.join(self.path, name)

    def __call__(self, batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        # The index's tables mutate as one family under the POSTINGS
        # lock (writer here; compact_neardup_index takes the same one):
        # the compaction replay guard must be decided for the WHOLE
        # batch — probe included — because once this batch's postings
        # are folded into batch_id=-1, a replayed probe would see its
        # OWN folded postings as "history" (-1 < any id) and emit
        # spurious self-matches. Guard + probe + all three writes form
        # one critical section so a maintenance-cadence compaction can
        # never fold this batch between the check and the writes.
        from cdc_pipeline_spark.streaming.rollup import _replay_folded, _table_lock

        # Pure derivation from batch_df — signatures, postings, shingle
        # sets — happens OUTSIDE the lock: it reads no index state, and
        # it is the expensive part of a large micro-batch. Holding the
        # postings lock across it would blow the lock's 600 s staleness
        # horizon (_LOCK_STALE_SECONDS), letting a maintenance-cadence
        # compaction "break" a live writer's lock and rename-aside the
        # table mid-write. A folded replay wastes this compute once —
        # correctness is unaffected (the guard still gates the writes).
        docs = batch_df.select(
            F.col(self.id_col).alias("doc_id"), F.col(self.text_col).alias("text")
        ).localCheckpoint()  # signatures + shingles + probe read it; cut lineage once

        sig = minhash_signatures(docs, "doc_id", "text", self.n, self.num_perm)
        # both are probed AND written, and the probe's hot-bucket cap
        # evaluates its input more than once — one O(batch)
        # materialization each, never one of the full history
        posting = (
            band_posting(sig, self.num_perm, self.bands)
            .withColumn("batch_id", F.lit(int(batch_id)))
            .localCheckpoint()
        )
        shingles = (
            _shingled(docs, "doc_id", "text", self.n)
            .select("doc_id", "shingles")
            .withColumn("batch_id", F.lit(int(batch_id)))
            .localCheckpoint()
        )

        with _table_lock(self._sub("postings")):
            if _replay_folded(self._sub("postings"), self.run_id, batch_id):
                return
            matches = self._probe(spark, posting, shingles, batch_id)
            # probe BEFORE appending (and against batch_id < current only):
            # a replayed batch sees exactly the history it saw the first
            # time, so every table rewrite below is bit-identical.
            # postings write LAST: the replay guard reads the POSTINGS
            # marker, so "this batch's postings are folded" must imply
            # matches and shingles landed too — the reverse order would
            # let a crash-after-postings + compaction make the guard
            # skip a batch whose shingle sets never hit the index
            # (silently unverifiable near-dups forever)
            _write_batch_partition(matches, self._sub("matches"))
            _write_batch_partition(shingles, self._sub("shingles"))
            _write_batch_partition(posting, self._sub("postings"))

    def _probe(
        self, spark: SparkSession, posting: DataFrame, shingles: DataFrame, batch_id: int
    ) -> DataFrame:
        empty = spark.createDataFrame([], _MATCH_SCHEMA)
        # existence is decided by the READ, not a driver-local
        # os.path probe: the index path may be HDFS/S3 (the module's
        # stated 100 TB layout), where os.path.isdir is always False
        # and would silently disable detection forever
        try:
            hist_posting = spark.read.parquet(self._sub("postings")).filter(
                F.col("batch_id") < batch_id
            )
            hist_shingles_raw = spark.read.parquet(self._sub("shingles")).filter(
                F.col("batch_id") < batch_id
            )
        except AnalysisException:  # no index yet (first batch)
            return empty
        # a doc re-ingested in several batches has one shingle row per
        # batch; keep one (latest) so each (doc, match) pair verifies
        # once — matching the batch twin's per-doc_id signature grouping
        hist_shingles = hist_shingles_raw.groupBy(
            F.col("doc_id").alias("match_id")
        ).agg(F.max_by("shingles", "batch_id").alias("__sb"))
        hist_rows = hist_posting.select(
            "band", "bucket", "doc_id", F.lit(False).alias("__inc")
        )
        if self.max_bucket is not None:
            # a doc re-ingested across batches carries duplicate
            # (band, bucket, doc_id) history rows; the cap must count
            # DOCS per bucket (like the batch twin, which has one row
            # per doc) or a boundary bucket's fate would flip when
            # compaction dedupes postings to distinct. Only paid when a
            # cap is set — without one, duplicate candidates are already
            # absorbed by the candidate join's distinct.
            hist_rows = hist_rows.dropDuplicates(["band", "bucket", "doc_id"])
        # the cap counts both sides together, like the batch twin: the
        # hazard is a hot HISTORICAL bucket multiplying every probe
        both = prune_hot_buckets(
            posting.select(
                "band", "bucket", "doc_id", F.lit(True).alias("__inc")
            ).unionByName(hist_rows),
            ["band", "bucket"],
            self.max_bucket,
        )
        cand = (
            both.filter(F.col("__inc"))
            .select("band", "bucket", "doc_id")
            .join(
                both.filter(~F.col("__inc")).select(
                    "band", "bucket", F.col("doc_id").alias("match_id")
                ),
                ["band", "bucket"],
            )
            # a re-ingested id probing its OWN earlier postings is not a
            # near-dup discovery — the batch twin structurally cannot
            # emit (d, d) (one row per doc splits strictly into
            # incoming/historical), so the stream must not either
            .filter(F.col("doc_id") != F.col("match_id"))
            .select("doc_id", "match_id")
            .distinct()
        )
        a = shingles.select("doc_id", F.col("shingles").alias("__sa"))
        b = hist_shingles
        inter = F.size(F.array_intersect(F.col("__sa"), F.col("__sb")))
        jacc = inter / (F.size("__sa") + F.size("__sb") - inter)
        return (
            cand.join(a, "doc_id")
            .join(b, "match_id")
            .withColumn("jaccard", round_half_up(jacc, 6))
            .filter(F.col("jaccard") >= self.threshold)
            .select("doc_id", "match_id", "jaccard")
            .withColumn("batch_id", F.lit(int(batch_id)))
        )


def _write_batch_partition(df: DataFrame, path: str) -> None:
    """Overwrite exactly this batch's partition (same contract as
    rollup._write_partials; per-write dynamic mode, never session conf)."""
    (
        df.coalesce(1)
        .write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy("batch_id")
        .parquet(path)
    )


_MATCH_SCHEMA = "doc_id long, match_id long, jaccard double, batch_id int"


def read_matches(spark: SparkSession, path: str) -> DataFrame:
    """All landed near-dup matches: (doc_id, match_id, jaccard, batch_id).

    The schema is explicit: a clean corpus writes zero match FILES per
    batch, and schema inference over a file-less directory raises
    ``UNABLE_TO_INFER_SCHEMA`` — here it returns an empty typed frame.
    """
    try:
        return spark.read.schema(_MATCH_SCHEMA).parquet(os.path.join(path, "matches"))
    except AnalysisException:  # directory never created (no batch ran)
        return spark.createDataFrame([], _MATCH_SCHEMA)


def compact_neardup_index(
    spark: SparkSession, path: str, run_id: str = "", lock_timeout: float = 30.0
) -> tuple[int, int]:
    """Fold the PROBED tables — ``postings/`` and ``shingles/`` — into
    one ``batch_id=-1`` partition each; thousands of micro-batches
    otherwise mean every per-batch probe pays a thousands-of-tiny-files
    listing + scan on its history side.

    Fold semantics preserve probe results exactly (pinned by the golden
    test):

    * postings fold to DISTINCT (band, bucket, doc_id) — the candidate
      join ``.distinct()``s anyway, so duplicate rows from a doc
      re-ingested across batches never changed results; dropping them
      here also shrinks the index.
    * shingles fold keeps each doc's LATEST row (``max_by(batch_id)``)
      — exactly the row the probe's per-doc latest-pick selects today;
      folding without the dedup would instead tie every re-ingested
      doc's rows at batch_id=-1 and make that pick nondeterministic.
    * ``matches/`` is an OUTPUT LOG, not probed state: its batch_id
      column is part of the result surface (which batch detected the
      dup), so compaction leaves it untouched.

    Holds the same postings lock as the writer's critical section, so
    a fold can't interleave a live batch's probe-then-append. The
    replay marker (written into both folded tables, guard reads the
    postings one) makes a replayed already-folded batch a no-op.
    Returns (posting_rows, shingle_rows) after compaction.
    """
    from cdc_pipeline_spark.streaming.rollup import _swap_compacted, _table_lock

    with _table_lock(os.path.join(path, "postings"), timeout=lock_timeout):
        counts = []
        for sub, fold in (
            (
                "postings",
                lambda df: df.select("band", "bucket", "doc_id").distinct(),
            ),
            (
                "shingles",
                lambda df: df.groupBy("doc_id").agg(
                    F.max_by("shingles", "batch_id").alias("shingles")
                ),
            ),
        ):
            table = os.path.join(path, sub)
            try:
                partials = spark.read.parquet(table)
            except AnalysisException:  # index never written
                counts.append(0)
                continue
            folded = fold(partials).withColumn("batch_id", F.lit(-1))
            counts.append(_swap_compacted(spark, table, partials, folded, run_id))
    return counts[0], counts[1]


# ---------------------------------------------------------------------------
# Perceptual-hash (image) near-dup index: the SAME probe-then-append
# layering over dedup.banded_chunks — batch and stream share one
# banding implementation (r10 factored it out; r11 routes the stream
# through it, VERDICT r10 #8), so bucket keying can never drift.
# ---------------------------------------------------------------------------


class PhashNearDupIndexWriter:
    """``foreachBatch`` writer: continuous image near-dup against the
    historical corpus. Each micro-batch of ``(id_col, payload_col)``
    rows:

      1. decodes + hashes its images in ONE Arrow pass
         (`multimodal.image_phash`) — undecodable payloads keep their
         in-band ``decoded=false`` audit row in ``hashes/`` but post no
         bands and match nothing;
      2. probes its band chunks against every STRICTLY EARLIER batch's
         postings (incoming x history only) and verifies candidates
         with ``bit_count(xor) <= max_hamming`` on the stored hashes;
      3. appends its own postings + hashes.

    Storage mirrors :class:`NearDupIndexWriter`: ``postings/`` holds
    (band, chunk, doc_id), ``hashes/`` holds (doc_id, ahash, dhash,
    decoded) — ONE long per signature instead of MinHash's shingle
    arrays, so the verify side of the index is ~8 bytes/doc at 100 TB —
    and ``matches/`` the output log; all partitioned by batch_id with
    dynamic overwrite, probe reading only ``batch_id < current``, the
    postings lock + replay-folded guard forming the same critical
    section (compaction shares it), so the operator is
    replay-idempotent with no marker files."""

    def __init__(
        self,
        path: str,
        id_col: str = "doc_id",
        payload_col: str = "payload",
        bits: int = 64,
        bands: int = 4,
        max_hamming: int = 3,
        max_bucket: int | None = None,
        run_id: str = "",
    ) -> None:
        if bits % bands:
            raise ValueError(f"bands={bands} must divide bits={bits}")
        self.path = path
        self.id_col = id_col
        self.payload_col = payload_col
        self.bits = bits
        self.bands = bands
        self.max_hamming = max_hamming
        self.max_bucket = max_bucket
        self.run_id = run_id

    def _sub(self, name: str) -> str:
        return os.path.join(self.path, name)

    def __call__(self, batch_df: DataFrame, batch_id: int) -> None:
        from cdc_pipeline_spark.operators.dedup import banded_chunks
        from cdc_pipeline_spark.operators.multimodal import image_phash
        from cdc_pipeline_spark.streaming.rollup import _replay_folded, _table_lock

        # expensive derivation (Arrow decode) OUTSIDE the lock — same
        # staleness-horizon reasoning as NearDupIndexWriter.__call__
        hashes = (
            image_phash(batch_df, self.id_col, self.payload_col)
            .withColumn("batch_id", F.lit(int(batch_id)))
            .localCheckpoint()  # posted AND probed AND written: cut once
        )
        posting = (
            banded_chunks(
                hashes.filter("decoded"), "doc_id", "ahash", self.bits, self.bands
            )
            .select("doc_id", "band", "chunk")
            .withColumn("batch_id", F.lit(int(batch_id)))
            .localCheckpoint()
        )
        with _table_lock(self._sub("postings")):
            if _replay_folded(self._sub("postings"), self.run_id, batch_id):
                return
            matches = self._probe(batch_df.sparkSession, posting, hashes, batch_id)
            # postings LAST — the replay guard reads the postings
            # marker, so folded postings must imply landed matches+hashes
            _write_batch_partition(matches, self._sub("matches"))
            _write_batch_partition(hashes, self._sub("hashes"))
            _write_batch_partition(posting, self._sub("postings"))

    def _probe(
        self, spark: SparkSession, posting: DataFrame, hashes: DataFrame, batch_id: int
    ) -> DataFrame:
        from cdc_pipeline_spark.operators.dedup import prune_hot_buckets

        empty = spark.createDataFrame([], _PHASH_MATCH_SCHEMA)
        try:  # existence decided by the READ (HDFS/S3-safe), as above
            hist_posting = spark.read.parquet(self._sub("postings")).filter(
                F.col("batch_id") < batch_id
            )
            hist_hashes_raw = spark.read.parquet(self._sub("hashes")).filter(
                (F.col("batch_id") < batch_id) & F.col("decoded")
            )
        except AnalysisException:  # no index yet (first batch)
            return empty
        # re-ingested docs: latest hash row wins, like the shingle pick
        hist_hashes = hist_hashes_raw.groupBy(
            F.col("doc_id").alias("match_id")
        ).agg(F.max_by("ahash", "batch_id").alias("__ha"))
        hist_rows = hist_posting.select(
            "band", "chunk", "doc_id", F.lit(False).alias("__inc")
        )
        if self.max_bucket is not None:
            # cap counts DOCS per bucket across both sides (batch-twin
            # semantics; duplicate history rows from re-ingestion must
            # not flip a boundary bucket) — same shape as the MinHash
            # writer's probe
            hist_rows = hist_rows.dropDuplicates(["band", "chunk", "doc_id"])
        both = prune_hot_buckets(
            posting.select("band", "chunk", "doc_id", F.lit(True).alias("__inc"))
            .unionByName(hist_rows),
            ["band", "chunk"],
            self.max_bucket,
            what="phash index chunk",
        )
        cand = (
            both.filter(F.col("__inc"))
            .select("band", "chunk", "doc_id")
            .join(
                both.filter(~F.col("__inc")).select(
                    "band", "chunk", F.col("doc_id").alias("match_id")
                ),
                ["band", "chunk"],
            )
            .filter(F.col("doc_id") != F.col("match_id"))  # no self-matches
            .select("doc_id", "match_id")
            .distinct()
        )
        inc = hashes.filter("decoded").select(
            "doc_id", F.col("ahash").alias("__hi")
        )
        ham = F.bit_count(F.col("__hi").bitwiseXOR(F.col("__ha")))
        return (
            cand.join(inc, "doc_id")
            .join(hist_hashes, "match_id")
            .withColumn("hamming", ham.cast("int"))
            .filter(F.col("hamming") <= self.max_hamming)
            .select("doc_id", "match_id", "hamming")
            .withColumn("batch_id", F.lit(int(batch_id)))
        )


_PHASH_MATCH_SCHEMA = "doc_id long, match_id long, hamming int, batch_id int"


def read_phash_matches(spark: SparkSession, path: str) -> DataFrame:
    """All landed image near-dup matches: (doc_id, match_id, hamming,
    batch_id) — explicit schema for the zero-match-files case, like
    :func:`read_matches`."""
    try:
        return spark.read.schema(_PHASH_MATCH_SCHEMA).parquet(
            os.path.join(path, "matches")
        )
    except AnalysisException:
        return spark.createDataFrame([], _PHASH_MATCH_SCHEMA)


def compact_phash_index(
    spark: SparkSession, path: str, run_id: str = "", lock_timeout: float = 30.0
) -> tuple[int, int]:
    """Fold ``postings/`` (distinct (band, chunk, doc_id)) and
    ``hashes/`` (latest decoded-flagged row per doc — max_by preserves
    the probe's per-doc pick) into batch_id=-1, exactly the
    :func:`compact_neardup_index` semantics under the same postings
    lock. ``matches/`` is the output log and stays untouched."""
    from cdc_pipeline_spark.streaming.rollup import _swap_compacted, _table_lock

    with _table_lock(os.path.join(path, "postings"), timeout=lock_timeout):
        counts = []
        for sub, fold in (
            ("postings", lambda df: df.select("band", "chunk", "doc_id").distinct()),
            (
                # per doc: latest DECODED row's hashes — exactly the
                # probe's pick (filter decoded, max_by batch_id), so a
                # doc whose re-ingest was corrupt keeps its last good
                # hash; max_by's null-key skip excludes quarantined
                # rows. decoded folds to bool_or: the probe's
                # decoded-filter must keep excluding never-decoded docs
                "hashes",
                lambda df: df.groupBy("doc_id").agg(
                    F.max_by(
                        "ahash", F.when(F.col("decoded"), F.col("batch_id"))
                    ).alias("ahash"),
                    F.max_by(
                        "dhash", F.when(F.col("decoded"), F.col("batch_id"))
                    ).alias("dhash"),
                    F.max("decoded").alias("decoded"),
                ),
            ),
        ):
            table = os.path.join(path, sub)
            try:
                partials = spark.read.parquet(table)
            except AnalysisException:
                counts.append(0)
                continue
            folded = fold(partials).withColumn("batch_id", F.lit(-1))
            counts.append(_swap_compacted(spark, table, partials, folded, run_id))
    return counts[0], counts[1]
