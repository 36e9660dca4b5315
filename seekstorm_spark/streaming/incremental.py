"""Incremental / near-real-time indexing via Structured Streaming.

The reference makes every indexed doc searchable immediately
(uncommitted level-0 searched alongside committed levels,
`/root/reference/seekstorm/src/realtime_search.rs:921-2095`) and
auto-commits every 65,536 docs per shard (`index.rs:5513-5521`).

Spark analog: a streaming source of documents → ``foreachBatch`` →
each micro-batch is tokenized and appended to the postings table as
new (term, block) rows for the batch's docid range; the query side
already unions across blocks, so fresh batches are searchable as soon
as their commit lands — the micro-batch boundary IS the level
boundary. Stats (N, avgdl) are refreshed in the index meta at each
batch, and the checkpointLocation gives exactly-once resume (the
streaming twin of the lineage-based batch resume).

Note: appended batches use block ranges disjoint from prior batches
(docid base = running doc count rounded up to a block boundary), so
no block is ever rewritten — the same append-only "no segment merges"
design the reference claims for latency consistency (README.md:192).
"""

from __future__ import annotations

import json
from typing import Any

import numpy as np
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from seekstorm_spark.codecs import ROARING_BLOCK_SIZE
from seekstorm_spark.index.builder import (
    build_posting_blocks,
    tokenize_to_term_rows,
)
from seekstorm_spark.index.store import IndexStore
from seekstorm_spark.quantization import decode_lengths


def append_batch(
    spark: SparkSession,
    store: IndexStore,
    batch_docs: DataFrame,
    text_col: str = "text",
) -> IndexStore:
    """Index one micro-batch into an existing (possibly empty) index.

    Docids start at the next block boundary after the current doc
    count, so the batch's (term, block) rows never collide with
    committed blocks.
    """
    meta = dict(store.meta)
    bs = int(meta.get("block_size", ROARING_BLOCK_SIZE))
    nd = int(meta.get("next_docid", 0))
    base_docid = ((nd + bs - 1) // bs * bs) if nd % bs else nd

    from seekstorm_spark.index.builder import assign_docids

    docs = assign_docids(
        batch_docs, order_col=text_col, n_buckets=16
    ).withColumn("docid", F.col("docid") + F.lit(base_docid))

    term_rows = tokenize_to_term_rows(
        docs, text_col, meta.get("tokenizer", "unicode_alphanumeric"),
        frozenset(meta.get("stop_words") or []) or None,
    ).cache()

    doc_meta = term_rows.filter(F.col("term") == "").select("docid", "dl_byte")
    doc_meta.write.mode("append").parquet(store.doc_meta_path)

    batch_n = doc_meta.count()
    hist = {
        int(r["dl_byte"]): int(r["cnt"])
        for r in doc_meta.groupBy("dl_byte").agg(F.count("*").alias("cnt")).collect()
    }
    batch_pos_sum = int(
        sum(int(decode_lengths(np.array([b]))[0]) * c for b, c in hist.items())
    )
    n_docs = int(meta.get("n_docs", 0)) + batch_n
    pos_sum = int(meta.get("positions_sum_normalized", 0)) + batch_pos_sum
    avgdl = float(np.float32(pos_sum) / np.float32(n_docs)) if n_docs else 1.0

    n_buckets = int(meta.get("n_buckets", 32))
    blocks = build_posting_blocks(
        term_rows.filter(F.col("term") != ""), n_buckets, block_size=bs
    )
    (
        blocks.repartition(n_buckets, "tbucket")
        .write.mode("append")
        .partitionBy("tbucket")
        .parquet(store.postings_path)
    )

    postings = spark.read.parquet(store.postings_path)
    term_stats = postings.filter(F.col("term") != "").groupBy(
        "tbucket", "term"
    ).agg(
        F.sum("posting_count").cast("long").alias("df"),
        F.count("*").cast("int").alias("n_blocks"),
        F.max("max_tf").cast("int").alias("max_tf"),
        F.min("min_dl_byte").cast("int").alias("min_dl_byte"),
        (
            F.sum(F.length("docids_vb"))
            + F.sum(F.length("tfs_vb"))
            + F.sum(F.length("dls"))
            + F.sum(F.length("positions_vb"))
        ).cast("long").alias("bytes"),
    )
    (
        term_stats.repartition(n_buckets, "tbucket")
        .write.mode("overwrite")
        .partitionBy("tbucket")
        .parquet(store.term_stats_path)
    )

    from seekstorm_spark.query.engine import invalidate_term_stats_cache

    invalidate_term_stats_cache(store.path)
    term_rows.unpersist()
    meta.update(
        {
            "n_docs": n_docs,
            "positions_sum_normalized": pos_sum,
            "avgdl": avgdl,
            "next_docid": base_docid + batch_n,
            "complete": True,
        }
    )
    store.meta = meta
    store.write_meta()
    return store


def start_incremental_indexing(
    spark: SparkSession,
    stream_df: DataFrame,
    index_path: str,
    checkpoint_path: str,
    text_col: str = "text",
    n_buckets: int = 32,
    trigger: dict[str, Any] | None = None,
):
    """Wire a streaming DataFrame into the index via foreachBatch.

    Returns the StreamingQuery. ``checkpoint_path`` provides
    exactly-once batch tracking across restarts.
    """
    import os

    store = IndexStore(path=index_path)
    if os.path.exists(store.meta_path):
        store = IndexStore.open(index_path)
    else:
        os.makedirs(index_path, exist_ok=True)
        store.meta = {
            "version": 1,
            "tokenizer": "unicode_alphanumeric",
            "stop_words": [],
            "n_docs": 0,
            "positions_sum_normalized": 0,
            "avgdl": 1.0,
            "n_buckets": n_buckets,
            "block_size": ROARING_BLOCK_SIZE,
            "next_docid": 0,
            "complete": True,
        }
        store.write_meta()

    def handle(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        with open(store.meta_path) as f:
            store.meta = json.load(f)
        append_batch(spark, store, batch_df, text_col)

    writer = stream_df.writeStream.foreachBatch(handle).option(
        "checkpointLocation", checkpoint_path
    )
    if trigger:
        writer = writer.trigger(**trigger)
    return writer.start()
