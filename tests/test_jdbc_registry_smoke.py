"""Live-infra smoke tests for the JDBC snapshot reader (S9) and the
Schema Registry client (S10) — skipped by default; flip them on where
the infrastructure exists:

  JDBC_URL=jdbc:postgresql://host:5432/db JDBC_USER=... JDBC_PASSWORD=...
      [JDBC_TABLE=...]                       → runs the S9 tests
  SCHEMA_REGISTRY_URL=http://host:8081 SCHEMA_REGISTRY_SUBJECT=subj
      → runs the S10 test

Like tests/test_kafka_smoke.py, the point is that a deployment can
verify the live-infra rows with nothing but environment variables; in
the sandbox these collect and skip.
"""

from __future__ import annotations

import os

import pytest

JDBC_URL = os.environ.get("JDBC_URL")
# all three must be present, or a partially-configured environment
# (e.g. a trust-auth database with no JDBC_USER yet) turns the skip
# into a KeyError test ERROR
JDBC_READY = bool(
    JDBC_URL and os.environ.get("JDBC_USER") and os.environ.get("JDBC_PASSWORD")
)
JDBC_TABLE = os.environ.get("JDBC_TABLE", "pg_catalog.pg_tables")
REGISTRY_URL = os.environ.get("SCHEMA_REGISTRY_URL")
REGISTRY_SUBJECT = os.environ.get("SCHEMA_REGISTRY_SUBJECT")


def _require_jdbc_driver(spark):
    """The Postgres JDBC driver jar ships separately; skip cleanly when
    the deployment has a database but no driver on the classpath."""
    try:
        spark._jvm.java.lang.Class.forName("org.postgresql.Driver")
    except Exception:
        pytest.skip("org.postgresql.Driver not on the Spark classpath")


@pytest.mark.skipif(
    not JDBC_READY, reason="set JDBC_URL/JDBC_USER/JDBC_PASSWORD to run"
)
def test_jdbc_snapshot_reads_rows(spark):
    from cdc_pipeline_spark.sources.jdbc import read_table_snapshot

    _require_jdbc_driver(spark)
    df = read_table_snapshot(
        spark,
        JDBC_URL,
        JDBC_TABLE,
        user=os.environ["JDBC_USER"],
        password=os.environ["JDBC_PASSWORD"],
    )
    assert df.columns, "snapshot must expose a schema"
    assert df.limit(1).count() in (0, 1)  # read path executes end-to-end


@pytest.mark.skipif(
    not JDBC_READY, reason="set JDBC_URL/JDBC_USER/JDBC_PASSWORD to run"
)
def test_jdbc_partitioned_read_matches_single_partition(spark):
    """The scale path: a range-partitioned read must return exactly the
    rows of the plain read (no dropped/duplicated boundary rows)."""
    from pyspark.sql import functions as F

    from cdc_pipeline_spark.sources.jdbc import read_table_snapshot

    _require_jdbc_driver(spark)
    table = os.environ.get("JDBC_PARTITION_TABLE")
    column = os.environ.get("JDBC_PARTITION_COLUMN")
    if not table or not column:
        pytest.skip("set JDBC_PARTITION_TABLE and JDBC_PARTITION_COLUMN (integer col)")
    creds = dict(user=os.environ["JDBC_USER"], password=os.environ["JDBC_PASSWORD"])
    plain = read_table_snapshot(spark, JDBC_URL, table, **creds)
    bounds = plain.agg(
        F.min(column).alias("lo"), F.max(column).alias("hi")
    ).collect()[0]
    parted = read_table_snapshot(
        spark,
        JDBC_URL,
        table,
        partition_column=column,
        lower_bound=int(bounds["lo"]),
        upper_bound=int(bounds["hi"]) + 1,
        num_partitions=4,
        **creds,
    )
    assert parted.rdd.getNumPartitions() == 4
    assert parted.count() == plain.count()
    assert parted.exceptAll(plain).count() == 0
    assert plain.exceptAll(parted).count() == 0


@pytest.mark.skipif(
    not (REGISTRY_URL and REGISTRY_SUBJECT),
    reason="set SCHEMA_REGISTRY_URL and SCHEMA_REGISTRY_SUBJECT to run",
)
def test_schema_registry_fetch_returns_parsable_avro():
    import json

    from cdc_pipeline_spark.sources.kafka_avro import fetch_schema_from_registry

    schema_json = fetch_schema_from_registry(REGISTRY_URL, REGISTRY_SUBJECT)
    schema = json.loads(schema_json)
    # Avro unions parse to a list and bare primitives to a str — check
    # the shape BEFORE calling .get, which only dicts have
    if isinstance(schema, list):
        assert schema, "union schema must name at least one branch"
        return
    if isinstance(schema, str):
        assert schema in ("string", "bytes", "long", "int", "boolean", "double")
        return
    assert schema.get("type") in ("record", "string", "bytes", "long")
    if schema.get("type") == "record":
        # must be decodable by the jar-free codec too
        from cdc_pipeline_spark.sources.avro_codec import compile_decoder

        assert compile_decoder(schema_json) is not None
