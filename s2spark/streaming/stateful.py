"""Custom stateful streaming operator via applyInPandasWithState:
cumulative per-tile statistics that survive restarts through the
checkpointed state store.

This is the engine's "custom operator Spark lacks" escape hatch for
streams (task brief): the grouped state function sees each micro-
batch's rows for a tile plus that tile's persisted state, and emits
updated running aggregates.  Cell assignment stays a pure function of
the row (kernel UDF upstream); only the running totals are stateful.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import SparkSession, functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (DoubleType, LongType, StructField,
                               StructType)

from .. import functions as s2f
from ..sources import geo

OUTPUT = StructType([StructField("tile", LongType()),
                     StructField("n_total", LongType()),
                     StructField("sum_value", DoubleType())])
STATE = StructType([StructField("n", LongType()),
                    StructField("s", DoubleType())])


def _update(key, pdfs, state: GroupState):
    n, s = state.get if state.exists else (0, 0.0)
    for pdf in pdfs:
        n += len(pdf)
        s += float(pdf["value"].sum())
    state.update((n, s))
    yield pd.DataFrame({"tile": [key[0]], "n_total": [n],
                        "sum_value": [s]})


def stream_tile_state(spark: SparkSession, source_dir: str,
                      checkpoint_dir: str, out_dir: str,
                      key_col: str = "event_id", tile_level: int = 4):
    """availableNow stream -> cumulative (batch_id, tile, n_total,
    sum_value) rows appended under out_dir; restarting with the same
    checkpoint restores each tile's running totals from the state
    store and processes only new files.  (foreachBatch sink: the
    memory sink cannot recover from a checkpoint.)"""
    schema = spark.read.parquet(source_dir).schema
    src = spark.readStream.schema(schema).parquet(source_dir)
    g = geo.geo_struct_udf()(F.col(key_col)).alias("_g")
    tiles = (src.select("value", g)
             .select("value", s2f.prefix_col(F.col("_g.cell_id"),
                                             tile_level).alias("tile")))
    out = (tiles.groupBy("tile")
           .applyInPandasWithState(_update, OUTPUT, STATE, "update",
                                   GroupStateTimeout.NoTimeout))

    def sink(batch_df, batch_id: int) -> None:
        (batch_df.withColumn("batch_id", F.lit(int(batch_id)))
         .write.mode("append").parquet(out_dir))

    return (out.writeStream.outputMode("update")
            .foreachBatch(sink)
            .option("checkpointLocation", checkpoint_dir)
            .trigger(availableNow=True)
            .start())
