"""Streaming state across real micro-batch boundaries.

The catalog's streaming queries drain their file source in one
availableNow batch; this test forces MULTIPLE micro-batches
(maxFilesPerTrigger=1 over a split dataset) so GroupState genuinely
persists and accumulates across batches — then checks the final state
against the batch answer. The integer-cent accumulator makes the total
exact regardless of how rows land in batches (see
streaming/stream_queries.py q93).
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from mapreduce_mit_spark.sources.io import load_table
from mapreduce_mit_spark.streaming.stream_queries import (
    _OUT_SCHEMA,
    _STATE_SCHEMA,
    _user_totals,
)

from .conftest import SF_SMALL


@pytest.fixture(scope="module")
def split_events(spark, tmp_path_factory):
    """events at sf0.001 written as 3 parquet files in one directory."""
    d = str(tmp_path_factory.mktemp("stream_src"))
    events = load_table(spark, SF_SMALL, "events")
    events.repartition(3).write.mode("overwrite").parquet(d)
    return d, events


def test_groupstate_accumulates_across_batches(spark, split_events):
    from pyspark.sql.streaming.state import GroupStateTimeout

    src_dir, events = split_events
    schema = spark.read.parquet(src_dir).schema
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)  # one file per micro-batch
        .parquet(src_dir)
    )
    updates = stream.groupBy("user_id").applyInPandasWithState(
        _user_totals,
        outputStructType=_OUT_SCHEMA,
        stateStructType=_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
    q = (
        updates.writeStream.format("memory")
        .queryName("multi_batch_sink")
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    n_batches = len(q.recentProgress)
    assert n_batches >= 3, f"expected >=3 micro-batches, got {n_batches}"

    # update mode re-emits a user's row each batch it appears in; the
    # LAST emission per user is the final state
    sink = spark.table("multi_batch_sink")
    final = {}
    for r in sink.collect():  # memory sink appends in batch order
        final[r["user_id"]] = (r["n_events"], r["total_cents"])

    expect = {
        r["user_id"]: (r["n"], r["cents"])
        for r in events.groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.expr("CAST(round(value * 100) AS BIGINT)")).alias("cents"),
        )
        .collect()
    }
    assert final == expect
