"""Streaming → JDBC sink with exactly-once TABLE STATE.

The reference's sink is a SQL-Server table fed by a wall-clock polling
loop (reference project/etl2.py:262-267,462-467). Structured Streaming's
``foreachBatch`` is at-least-once — a crashed/retried micro-batch runs
again — so a bare append duplicates rows. This sink makes the retry
IDEMPOTENT with the standard delete-then-insert recipe:

    every row carries its micro-batch id; processing batch N first
    deletes ``WHERE __batch_id = N`` then appends the tagged rows.

A retry (or a crash mid-insert followed by a retry) always converges to
exactly one copy of the batch — no ledger table, no distributed
transaction, works against any JDBC store that supports DELETE. The
checkpoint guarantees batch ids are stable across restarts, which is
what makes the tag a reliable idempotency key.

Scale: the DELETE touches one batch's key range (indexable on
``__batch_id``); the INSERT is Spark's partition-parallel JDBC write
(each executor opens one connection — see sources/sinks.py:write_jdbc).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from _data_engineering_pipeline_project_spark.sources.sinks import (
    DERBY_DRIVER,
    write_jdbc,
)


def _execute_query_scalar(spark: SparkSession, url: str, sql: str):
    """Run one scalar query through the JVM DriverManager (existence
    probes); raises on missing tables."""
    jvm = spark.sparkContext._jvm
    conn = jvm.java.sql.DriverManager.getConnection(url)
    try:
        stmt = conn.createStatement()
        try:
            rs = stmt.executeQuery(sql)
            rs.next()
            return rs.getLong(1)
        finally:
            stmt.close()
    finally:
        conn.close()


def _execute_update(spark: SparkSession, url: str, sql: str) -> None:
    """Run one DML statement through the JVM's DriverManager (works for
    embedded Derby in the same JVM; any JDBC URL in general)."""
    jvm = spark.sparkContext._jvm
    conn = jvm.java.sql.DriverManager.getConnection(url)
    try:
        stmt = conn.createStatement()
        try:
            stmt.executeUpdate(sql)
        finally:
            stmt.close()
    finally:
        conn.close()


class JdbcIdempotentSink:
    """``foreachBatch`` target writing micro-batches to a JDBC table with
    retry-idempotent semantics (delete-then-insert keyed on the batch id).
    """

    def __init__(
        self,
        spark: SparkSession,
        url: str,
        table: str,
        driver: str = DERBY_DRIVER,
    ) -> None:
        self.spark = spark
        self.url = url
        self.table = table
        self.driver = driver
        # existence is probed against the DATABASE, never tracked in
        # driver memory: a restarted driver with a populated sink table
        # would otherwise take the create-with-overwrite path on its
        # first batch and WIPE prior committed batches
        self._known_exists = False

    def _table_exists(self) -> bool:
        if self._known_exists:
            return True
        try:
            _execute_query_scalar(
                self.spark, self.url, f"SELECT count(*) FROM {self.table} WHERE 1=0"
            )
            self._known_exists = True
            return True
        except Exception:
            return False

    def process_batch(self, batch_df: DataFrame, batch_id: int) -> None:
        tagged = batch_df.withColumn("__batch_id", F.lit(batch_id))
        if self._table_exists():
            # idempotency: wipe any partial/previous copy of THIS batch
            _execute_update(
                self.spark,
                self.url,
                # quoted: Spark's JDBC writer creates case-sensitive quoted
                # identifiers, which Derby otherwise upper-cases
                f'DELETE FROM {self.table} WHERE "__batch_id" = {batch_id}',
            )
            write_jdbc(
                tagged, self.url, self.table, mode="append", driver=self.driver
            )
        else:
            # very first batch ever creates the table
            write_jdbc(
                tagged, self.url, self.table, mode="overwrite", driver=self.driver
            )
            self._known_exists = True


def run_stream_jdbc_sink(
    spark: SparkSession,
    source_dir: str,
    schema,
    checkpoint_dir: str,
    url: str,
    table: str,
) -> JdbcIdempotentSink:
    """Drain ``source_dir`` into the JDBC table exactly-once
    (AvailableNow trigger; the long-running form swaps in a
    processingTime trigger, cf. streaming/microbatch.py)."""
    sink = JdbcIdempotentSink(spark, url, table)
    q = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(source_dir)
        .writeStream.foreachBatch(sink.process_batch)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return sink
