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
batch; block-max bounds are stored avgdl-free (format v2) and
computed at query time, so pruning stays admissible as avgdl drifts
across appends. foreachBatch is at-least-once, so appends are made
idempotent: staged writes promoted under deterministic per-batch file
names + applied-batch ids recorded in meta (see append_batch).

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


def _promote_staged(stage_dir: str, dest_dir: str, tag: str) -> None:
    """Move staged parquet files into the live table under
    DETERMINISTIC names (``batch<tag>-<i>.parquet``). A retried batch
    re-stages and ``os.replace``s the SAME target names, so a crash
    between promotion and the meta commit never duplicates rows —
    the local-FS analog of an Iceberg append commit."""
    import os

    os.makedirs(dest_dir, exist_ok=True)
    files = sorted(
        f for f in os.listdir(stage_dir) if f.endswith(".parquet")
    )
    for i, f in enumerate(files):
        os.replace(
            os.path.join(stage_dir, f),
            os.path.join(dest_dir, f"batch{tag}-{i:05d}.parquet"),
        )


def append_batch(
    spark: SparkSession,
    store: IndexStore,
    batch_docs: DataFrame,
    text_col: str = "text",
    batch_id: int | None = None,
) -> IndexStore:
    """Index one micro-batch into an existing (possibly empty) index.

    Docids start at the next block boundary after the current doc
    count, so the batch's (term, block) rows never collide with
    committed blocks.

    Idempotent under at-least-once replay: batch data is written to a
    staging dir, promoted into the live tables under deterministic
    per-batch file names (a replay overwrites rather than duplicates),
    and the meta commit — which records the applied ``batch_id`` —
    happens last. A batch whose id is already in
    ``meta.applied_batches`` is skipped entirely.
    """
    import os
    import shutil

    meta = dict(store.meta)
    if batch_id is not None and batch_id in (meta.get("applied_batches") or []):
        return store
    bs = int(meta.get("block_size", ROARING_BLOCK_SIZE))
    nd = int(meta.get("next_docid", 0))
    base_docid = ((nd + bs - 1) // bs * bs) if nd % bs else nd
    tag = str(batch_id) if batch_id is not None else f"d{base_docid}"

    from seekstorm_spark.index.builder import assign_docids

    docs = assign_docids(
        batch_docs, order_col=text_col, n_buckets=16
    ).withColumn("docid", F.col("docid") + F.lit(base_docid))

    term_rows = tokenize_to_term_rows(
        docs, text_col, meta.get("tokenizer", "unicode_alphanumeric"),
        frozenset(meta.get("stop_words") or []) or None,
        stemmer=meta.get("stemmer"),
        frequent_terms=frozenset(meta.get("frequent_terms") or []) or None,
    ).cache()

    stage = os.path.join(store.path, "_staging", f"batch_{tag}")
    shutil.rmtree(stage, ignore_errors=True)

    doc_meta = term_rows.filter(F.col("term") == "").select(
        "docid", "field", "dl_byte"
    )
    doc_meta.write.mode("overwrite").parquet(os.path.join(stage, "doc_meta"))

    doc_meta = spark.read.parquet(os.path.join(stage, "doc_meta"))
    hist = {
        (int(r["field"]), int(r["dl_byte"])): int(r["cnt"])
        for r in doc_meta.groupBy("field", "dl_byte")
        .agg(F.count("*").alias("cnt"))
        .collect()
    }
    batch_n = int(sum(c for (fid, _b), c in hist.items() if fid == 0))
    batch_pos_sum = int(
        sum(
            int(decode_lengths(np.array([b]))[0]) * c
            for (_f, b), c in hist.items()
        )
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
        .write.mode("overwrite")
        .partitionBy("tbucket")
        .parquet(os.path.join(stage, "postings"))
    )
    term_rows.unpersist()

    # --- promote: deterministic renames, then derived tables, then meta
    _promote_staged(
        os.path.join(stage, "doc_meta"), store.doc_meta_path, tag
    )
    stage_postings = os.path.join(stage, "postings")
    for part in sorted(os.listdir(stage_postings)):
        if not part.startswith("tbucket="):
            continue
        _promote_staged(
            os.path.join(stage_postings, part),
            os.path.join(store.postings_path, part),
            tag,
        )
    shutil.rmtree(stage, ignore_errors=True)

    postings = spark.read.parquet(store.postings_path)
    term_stats = postings.filter(F.col("term") != "").groupBy(
        "tbucket", "term"
    ).agg(
        F.sum("df_block").cast("long").alias("df"),
        F.sum("posting_count").cast("long").alias("cf_fields"),
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
    applied = list(meta.get("applied_batches") or [])
    if batch_id is not None:
        applied.append(int(batch_id))
    meta.update(
        {
            "n_docs": n_docs,
            "positions_sum_normalized": pos_sum,
            "avgdl": avgdl,
            "next_docid": base_docid + batch_n,
            "applied_batches": applied,
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
        from seekstorm_spark.index.builder import INDEX_FORMAT_VERSION

        os.makedirs(index_path, exist_ok=True)
        store.meta = {
            "version": INDEX_FORMAT_VERSION,
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
        # batch_id makes the append idempotent under foreachBatch's
        # at-least-once replay (skip if applied; deterministic file
        # names if partially promoted)
        append_batch(spark, store, batch_df, text_col, batch_id=batch_id)

    writer = stream_df.writeStream.foreachBatch(handle).option(
        "checkpointLocation", checkpoint_path
    )
    if trigger:
        writer = writer.trigger(**trigger)
    return writer.start()
