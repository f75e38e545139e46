"""Structured Streaming variant of the extraction job.

The reference's streaming-shaped machinery is the DocumentCache read-ahead
over a page stream (/root/reference/src/ccstruct/imagedata.h:288) — a
memory-bounded producer/consumer. The Spark-native recast: docs arrive as
files in a directory (or a Kafka topic in production); each micro-batch runs
the SAME batch plan via foreachBatch and appends to the output sink.

Why foreachBatch instead of a pure streaming plan: the ordered per-doc
reassembly (A11) is a full-doc aggregation — legal in streaming only with
watermark + complete/update modes, but a doc's spans all arrive in one row
(the docs table is one row per doc), so per-batch batch-semantics are exact,
not an approximation. `maxFilesPerTrigger` bounds admission exactly like the
reference's memory-bounded cache.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..config import ExtractConfig
from ..fixtures.gen import DOCS_SCHEMA
from ..plans.pipeline import extract


def stream_extract(
    spark: SparkSession,
    docs_dir: str,
    media: DataFrame,
    out_dir: str,
    checkpoint_dir: str,
    cfg: ExtractConfig | None = None,
    max_files_per_trigger: int = 4,
    available_now: bool = True,
):
    """Start (and by default drain) a file-source streaming extraction.

    Returns the StreamingQuery. With available_now=True the call blocks until
    the backlog is processed — the deterministic mode used in tests.
    """
    cfg = cfg or ExtractConfig()
    stream = (
        spark.readStream.schema(DOCS_SCHEMA)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(docs_dir)
    )

    def process_batch(batch_df: DataFrame, batch_id: int) -> None:
        result = extract(batch_df.sparkSession, batch_df, media, cfg)
        result.write.mode("append").parquet(out_dir)

    writer = (
        stream.writeStream.foreachBatch(process_batch)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("update")
    )
    if available_now:
        q = writer.trigger(availableNow=True).start()
        q.awaitTermination()
        return q
    return writer.start()
