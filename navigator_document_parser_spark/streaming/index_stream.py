"""Streaming inverted-index maintenance (foreachBatch + index_merge).

A crawl lands document parquet files continuously; the search side
wants the sharded posting-block index (operators/search.py
index_export layout) to follow without full rebuilds. Each micro-batch
folds the new documents into the committed index with index_merge —
only posting blocks in the delta's doc ranges are decoded and rebuilt,
so per-batch cost scales with the batch, not the index — and commits a
new index GENERATION:

    index_dir/
      gen=0/   parquet (full index after batch 0)
      gen=2/   parquet (full index after batch 2)
      _CURRENT a one-line pointer file naming the live generation

Readers resolve _CURRENT once and read one immutable generation —
never a directory being written. Generation id = the micro-batch id,
so a batch REPLAY after a crash rewrites its own generation
deterministically and re-points (idempotent by construction — the
same exactly-once shape as plans/sink.py's lineage dirs). The pointer
write is a tiny driver-side file write; on object stores swap it for
a conditional-put manifest (the documented Iceberg-shaped seam, same
as ParquetMergeSink.iceberg_merge_sql).

Each generation currently REWRITES the full index table (untouched
blocks pass through index_merge as data). At 100 TB the same loop
writes only affected blocks plus a manifest of inherited files — the
operator already splits untouched/affected, so the change is confined
to the writer below.

Stream==batch parity: after draining N batches the committed
generation equals index_export over the union of all batches — pinned
by pytest via index_merge's own invariant (merge == full rebuild, for
overlapping deltas too).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

from ..operators.search import index_export, index_merge

_POINTER = "_CURRENT"


def read_current_index(
    spark: SparkSession, index_dir: str
) -> DataFrame | None:
    """The live index generation, or None before the first commit."""
    ptr = os.path.join(index_dir, _POINTER)
    if not os.path.exists(ptr):
        return None
    with open(ptr) as f:
        gen = f.read().strip()
    return spark.read.parquet(os.path.join(index_dir, f"gen={gen}"))


def _commit_generation(index_dir: str, gen: int) -> None:
    """Point _CURRENT at ``gen`` via write-temp + atomic rename (POSIX
    rename is atomic; readers see the old or the new pointer, never a
    torn one)."""
    ptr = os.path.join(index_dir, _POINTER)
    tmp = ptr + ".tmp"
    with open(tmp, "w") as f:
        f.write(str(gen))
    os.replace(tmp, ptr)


def start_index_maintenance_stream(
    spark: SparkSession,
    input_dir: str,
    index_dir: str,
    checkpoint_dir: str,
    schema: str = "doc_id long, text string",
    id_col: str = "doc_id",
    text_col: str = "text",
    n_shards: int = 8,
    block_size: int = 128,
    available_now: bool = True,
    max_files_per_trigger: int | None = None,
):
    """Tail ``input_dir`` for document parquet files and keep the
    committed index under ``index_dir`` current. Returns the started
    StreamingQuery; availableNow=True drains the backlog and stops."""
    os.makedirs(index_dir, exist_ok=True)
    reader = spark.readStream.schema(schema)
    if max_files_per_trigger is not None:
        reader = reader.option(
            "maxFilesPerTrigger", str(max_files_per_trigger)
        )
    stream = reader.parquet(input_dir)

    def write_batch(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        old = read_current_index(spark, index_dir)
        if old is None:
            new_index = index_export(
                batch_df, id_col=id_col, text_col=text_col,
                n_shards=n_shards, block_size=block_size,
            )
        else:
            new_index = index_merge(
                old, batch_df, id_col=id_col, text_col=text_col,
                n_shards=n_shards, block_size=block_size,
            )
        gen_path = os.path.join(index_dir, f"gen={batch_id}")
        new_index.write.mode("overwrite").parquet(gen_path)
        _commit_generation(index_dir, batch_id)

    writer = (
        stream.writeStream.outputMode("append")
        .foreachBatch(write_batch)
        .option("checkpointLocation", checkpoint_dir)
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
