"""Incremental / near-real-time indexing via Structured Streaming.

The reference makes every indexed doc searchable immediately
(uncommitted level-0 searched alongside committed levels,
`/root/reference/seekstorm/src/realtime_search.rs:921-2095`) and
auto-commits every 65,536 docs per shard (`index.rs:5513-5521`).

Spark analog — a two-phase append with a searchable staging area:

* ``stage_batch`` tokenizes one micro-batch and writes its postings,
  doc_meta, per-batch term-stats DELTA, and facet blocks to a staging
  dir. The staged batch IS the reference's uncommitted level-0:
  ``query.engine.search(..., staged=[batch])`` unions the staged
  postings/stats into the query, so a doc is searchable the moment
  staging finishes — before any commit.
* ``commit_batch`` promotes the staged files into the live tables
  under deterministic per-batch names and writes meta last.
* ``append_batch`` = stage + commit (the foreachBatch path).

**Append cost is O(batch), not O(index)**: the term-stats table is
log-structured — each commit appends the batch's own (tbucket, term)
partial aggregates as new files in the touched ``tbucket=`` partitions
(readers sum df per term across partials; the reference equivalently
keeps per-level stats merged at query time). Nothing existing is ever
rewritten, so append wall time is independent of index size.

Appended batches use block ranges disjoint from prior batches (docid
base = running doc count rounded up to a block boundary), so no block
is ever rewritten — the same append-only "no segment merges" design
the reference claims for latency consistency (README.md:192). Stats
(N, avgdl) refresh in meta at each commit; block-max bounds are stored
avgdl-free (format v3+) and computed at query time, so pruning stays
admissible as avgdl drifts across appends.

foreachBatch is at-least-once, so appends are idempotent: staged
writes promoted under deterministic per-batch file names
(``batch<tag>-<i>.parquet``) + applied-batch ids recorded in meta.
"""

from __future__ import annotations

import json
import os
import shutil
from dataclasses import dataclass
from typing import Any

import numpy as np
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from seekstorm_spark.codecs import ROARING_BLOCK_SIZE
from seekstorm_spark.index.builder import (
    build_posting_blocks,
    term_stats_aggregate,
    tokenize_to_term_rows,
)
from seekstorm_spark.index.store import IndexStore
from seekstorm_spark.quantization import decode_lengths


@dataclass
class StagedBatch:
    """A tokenized-but-uncommitted micro-batch (realtime level-0).

    ``search(..., staged=[batch])`` makes it searchable pre-commit.
    """

    stage_path: str
    tag: str
    batch_id: int | None
    batch_n: int
    batch_pos_sum: int
    next_docid: int

    @property
    def postings_path(self) -> str:
        return os.path.join(self.stage_path, "postings")

    @property
    def term_stats_path(self) -> str:
        return os.path.join(self.stage_path, "term_stats")

    @property
    def doc_meta_path(self) -> str:
        return os.path.join(self.stage_path, "doc_meta")

    @property
    def facets_path(self) -> str:
        return os.path.join(self.stage_path, "facets")

    def save_manifest(self) -> None:
        with open(os.path.join(self.stage_path, "stage_meta.json"), "w") as f:
            json.dump(
                {
                    "tag": self.tag,
                    "batch_id": self.batch_id,
                    "batch_n": self.batch_n,
                    "batch_pos_sum": self.batch_pos_sum,
                    "next_docid": self.next_docid,
                },
                f,
            )

    @classmethod
    def load(cls, stage_path: str) -> "StagedBatch":
        with open(os.path.join(stage_path, "stage_meta.json")) as f:
            m = json.load(f)
        return cls(stage_path=stage_path, **m)


def _promote_staged(stage_dir: str, dest_dir: str, tag: str) -> None:
    """Move staged parquet files into the live table under
    DETERMINISTIC names (``batch<tag>-<i>.parquet``). A retried batch
    re-stages and ``os.replace``s the SAME target names, so a crash
    between promotion and the meta commit never duplicates rows —
    the local-FS analog of an Iceberg append commit."""
    os.makedirs(dest_dir, exist_ok=True)
    files = sorted(
        f for f in os.listdir(stage_dir) if f.endswith(".parquet")
    )
    for i, f in enumerate(files):
        os.replace(
            os.path.join(stage_dir, f),
            os.path.join(dest_dir, f"batch{tag}-{i:05d}.parquet"),
        )


def _promote_partitioned(stage_root: str, dest_root: str, tag: str, prefix: str) -> None:
    for part in sorted(os.listdir(stage_root)):
        if not part.startswith(prefix + "="):
            continue
        _promote_staged(
            os.path.join(stage_root, part),
            os.path.join(dest_root, part),
            tag,
        )


def _stage_facet_blocks(
    spark: SparkSession,
    store: IndexStore,
    docs: DataFrame,
    stage: str,
) -> None:
    """Facet byte arrays for the batch's block range, encoded against
    the index's EXISTING facet dictionaries (the sorted-dictionary ⇒
    byte-order invariant forbids extending a dictionary in place, so a
    batch value outside the dictionary is rejected before anything is
    promoted). Fixes the silent-exclusion / result-sort crash on
    faceted appends."""
    from seekstorm_spark.index.builder import encode_facet_blocks

    facet_meta = store.meta.get("facets") or {}
    if not facet_meta:
        return
    missing = [c for c in facet_meta if c not in docs.columns]
    if missing:
        raise ValueError(
            f"batch is missing facet columns {missing}; appends into a "
            "faceted index must carry every indexed facet column"
        )
    # validate string-facet values against the frozen dictionaries
    from seekstorm_spark.index.builder import facet_kind, facet_values

    for fc, spec in facet_meta.items():
        values = facet_values(spec)
        if values is None:  # numeric facet: any value encodes
            continue
        col = (
            docs.select(F.explode(F.col(fc)).alias(fc))
            if facet_kind(spec) == "string_set"
            else docs.select(fc)
        )
        # executor-side anti-join against the broadcast dictionary —
        # only OFFENDING values reach the driver (a pathological batch
        # must fail the gate, not OOM the driver collecting its
        # distincts first)
        spark = docs.sparkSession
        dict_df = spark.createDataFrame(
            [(str(v),) for v in values], "__known string"
        )
        new = [
            r[0]
            for r in col.filter(F.col(fc).isNotNull())
            .select(F.col(fc).cast("string").alias(fc))
            .distinct()
            .join(
                F.broadcast(dict_df),
                F.col(fc) == F.col("__known"),
                "left_anti",
            )
            .limit(5)
            .collect()
        ]
        if new:
            raise ValueError(
                f"facet {fc!r}: batch carries values {sorted(map(str, new))} "
                "not in the index dictionary; rebuild with a wider "
                "dictionary (byte order == value order forbids in-place "
                "dictionary growth)"
            )
    fb = encode_facet_blocks(
        docs, facet_meta, int(store.meta.get("block_size", ROARING_BLOCK_SIZE))
    )
    (
        fb.repartition(1, "facet")
        .write.mode("overwrite")
        .partitionBy("facet")
        .parquet(os.path.join(stage, "facets"))
    )


def stage_batch(
    spark: SparkSession,
    store: IndexStore,
    batch_docs: DataFrame,
    text_col: str = "text",
    batch_id: int | None = None,
    id_col: str | None = None,
    min_next_docid: int | None = None,
) -> StagedBatch | None:
    """Tokenize + write one micro-batch to the staging area (realtime
    level-0). Returns None when ``batch_id`` was already applied.

    Docids start at the next block boundary after the current doc
    count (so the batch's (term, block) rows never collide with
    committed blocks) unless ``id_col`` provides caller-managed ids —
    then blocks may be shared with committed ones and the query side
    merges rows per block (both are sound; block-sharing is what the
    realtime oracle row uses to keep docids == doc_id).
    """
    meta = dict(store.meta)
    if batch_id is not None and batch_id in (meta.get("applied_batches") or []):
        return None
    bs = int(meta.get("block_size", ROARING_BLOCK_SIZE))
    # min_next_docid lets a caller chain MULTIPLE uncommitted staged
    # batches (each next batch starts after the previous staged one)
    nd = max(int(meta.get("next_docid", 0)), int(min_next_docid or 0))

    from seekstorm_spark.index.builder import assign_docids

    if id_col is None and "docid" in batch_docs.columns:
        raise ValueError(
            "batch already carries a 'docid' column; pass id_col='docid' "
            "to use it as the index docid, or drop/rename it so the "
            "engine can assign block-aligned ids"
        )
    if id_col is not None:
        docs = batch_docs.withColumn("docid", F.col(id_col).cast("long"))
        ids = docs.agg(
            F.min("docid").alias("lo"), F.max("docid").alias("hi")
        ).collect()[0]
        base_docid = int(ids["lo"]) if ids["lo"] is not None else nd
        next_docid = max(nd, (int(ids["hi"]) + 1) if ids["hi"] is not None else nd)
    else:
        base_docid = ((nd + bs - 1) // bs * bs) if nd % bs else nd
        # order_col sorting happens per hash bucket on one task — fine
        # for micro-batches; bulk loads should pass id_col or use the
        # builder's partition-offset path (see assign_docids docstring)
        docs = assign_docids(
            batch_docs, order_col=text_col, n_buckets=16
        ).withColumn("docid", F.col("docid") + F.lit(base_docid))
        next_docid = None  # set after batch_n is known

    tag = str(batch_id) if batch_id is not None else f"d{base_docid}"
    stage = os.path.join(store.path, "_staging", f"batch_{tag}")
    shutil.rmtree(stage, ignore_errors=True)

    from seekstorm_spark.index.builder import synonym_map_from_groups

    by_field = meta.get("stop_words_by_field")
    stops = (
        {f: frozenset(v) for f, v in by_field.items()}
        if by_field
        else (frozenset(meta.get("stop_words") or []) or None)
    )
    term_rows = tokenize_to_term_rows(
        docs, text_col, meta.get("tokenizer", "unicode_alphanumeric"),
        stops,
        fields=meta.get("fields"),
        stemmer=meta.get("stemmer"),
        frequent_terms=frozenset(meta.get("frequent_terms") or []) or None,
        synonym_map=synonym_map_from_groups(meta.get("synonyms") or [])
        or None,
        ngram_patterns=meta.get("ngram_patterns"),
    ).cache()

    from seekstorm_spark.index.builder import (
        term_row_dl_byte,
        term_row_field,
    )

    doc_meta = term_rows.filter(F.col("term") == "").select(
        "docid",
        term_row_field(F.col("meta")).alias("field"),
        term_row_dl_byte(F.col("meta")).alias("dl_byte"),
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
    if next_docid is None:
        next_docid = base_docid + batch_n

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

    # per-batch term-stats DELTA from the staged postings only — the
    # O(batch) replacement for re-aggregating the whole index; readers
    # sum df per term across these log-structured partials
    staged_postings = spark.read.parquet(os.path.join(stage, "postings"))
    delta = term_stats_aggregate(staged_postings)
    (
        delta.repartition(n_buckets, "tbucket")
        .write.mode("overwrite")
        .partitionBy("tbucket")
        .parquet(os.path.join(stage, "term_stats"))
    )

    if meta.get("facets"):
        _stage_facet_blocks(spark, store, docs, stage)

    staged = StagedBatch(
        stage_path=stage,
        tag=tag,
        batch_id=batch_id,
        batch_n=batch_n,
        batch_pos_sum=batch_pos_sum,
        next_docid=next_docid,
    )
    staged.save_manifest()
    return staged


def commit_batch(
    spark: SparkSession, store: IndexStore, staged: StagedBatch
) -> IndexStore:
    """Promote a staged batch into the live tables (deterministic
    renames), then write meta (the commit point) last."""
    meta = dict(store.meta)
    tag = staged.tag
    _promote_staged(staged.doc_meta_path, store.doc_meta_path, tag)
    _promote_partitioned(
        staged.postings_path, store.postings_path, tag, "tbucket"
    )
    _promote_partitioned(
        staged.term_stats_path, store.term_stats_path, tag, "tbucket"
    )
    if os.path.exists(staged.facets_path):
        _promote_partitioned(
            staged.facets_path, store.facets_path, tag, "facet"
        )
    shutil.rmtree(staged.stage_path, ignore_errors=True)

    from seekstorm_spark.query.engine import invalidate_term_stats_cache

    invalidate_term_stats_cache(store.path)
    n_docs = int(meta.get("n_docs", 0)) + staged.batch_n
    pos_sum = int(meta.get("positions_sum_normalized", 0)) + staged.batch_pos_sum
    applied = list(meta.get("applied_batches") or [])
    if staged.batch_id is not None:
        applied.append(int(staged.batch_id))
    meta.update(
        {
            "n_docs": n_docs,
            "positions_sum_normalized": pos_sum,
            "avgdl": float(np.float32(pos_sum) / np.float32(n_docs))
            if n_docs
            else 1.0,
            "next_docid": max(int(meta.get("next_docid", 0)), staged.next_docid),
            "applied_batches": applied,
            "complete": True,
        }
    )
    store.meta = meta
    store.write_meta()
    return store


def append_batch(
    spark: SparkSession,
    store: IndexStore,
    batch_docs: DataFrame,
    text_col: str = "text",
    batch_id: int | None = None,
    id_col: str | None = None,
) -> IndexStore:
    """Index one micro-batch into an existing (possibly empty) index:
    ``stage_batch`` + ``commit_batch``. Idempotent under at-least-once
    replay (applied-batch ids + deterministic promoted names); cost is
    O(batch) — see module docstring."""
    staged = stage_batch(spark, store, batch_docs, text_col, batch_id, id_col)
    if staged is None:
        return store
    return commit_batch(spark, store, staged)


def update_documents(
    spark: SparkSession,
    store: IndexStore,
    batch_docs: DataFrame,
    old_docids: list[int],
    text_col: str = "text",
    batch_id: int | None = None,
    id_col: str | None = None,
) -> IndexStore:
    """Update = delete the old versions + index the new contents at
    fresh block-aligned docids (the reference's update_document is the
    same delete + re-add, api_endpoints.rs; postings are immutable).
    The old docids land in the delete set; ``compact`` reclaims them.
    ``id_col`` forwards to :func:`append_batch` for caller-managed
    docids on the re-added versions."""
    from seekstorm_spark.query.engine import delete_documents

    store = append_batch(
        spark, store, batch_docs, text_col, batch_id, id_col=id_col
    )
    delete_documents(spark, store, old_docids)
    return store


class RealtimeIndexer:
    """Reference-style realtime indexing session
    (`realtime_search.rs:921-2095` + the 64k auto-commit,
    `index.rs:5513-5521`): ``add_documents`` stages a batch that is
    searchable IMMEDIATELY via :meth:`search`; staged batches chain
    docid ranges and auto-commit once ``commit_every`` docs are
    pending OR ``commit_interval_s`` seconds have passed since the
    last commit (whichever fires first; both checked at
    ``add_documents`` time), or on an explicit :meth:`commit`.
    Staging is what makes docs searchable, so the time trigger bounds
    only the UNCOMMITTED (crash-replayable) window, not visibility
    latency."""

    def __init__(
        self,
        spark: SparkSession,
        store: IndexStore,
        text_col: str = "text",
        commit_every: int = ROARING_BLOCK_SIZE,
        id_col: str | None = None,
        commit_interval_s: float | None = None,
    ):
        import time

        self.spark = spark
        self.store = store
        self.text_col = text_col
        self.id_col = id_col
        self.commit_every = int(commit_every)
        self.commit_interval_s = (
            float(commit_interval_s) if commit_interval_s is not None else None
        )
        self._last_commit = time.monotonic()
        self.staged: list[StagedBatch] = []
        self._pending = 0
        applied = store.meta.get("applied_batches") or []
        self._next_batch_id = (max(applied) + 1) if applied else 0

    def add_documents(self, batch_docs: DataFrame) -> None:
        staged = stage_batch(
            self.spark,
            self.store,
            batch_docs,
            self.text_col,
            batch_id=self._next_batch_id,
            id_col=self.id_col,
            min_next_docid=self.staged[-1].next_docid if self.staged else None,
        )
        self._next_batch_id += 1
        if staged is None:
            return
        self.staged.append(staged)
        self._pending += staged.batch_n
        import time

        due = (
            self.commit_interval_s is not None
            and time.monotonic() - self._last_commit >= self.commit_interval_s
        )
        if self._pending >= self.commit_every or due:
            self.commit()

    def search(self, query: str, **kwargs):
        """Search committed levels PLUS every uncommitted staged batch
        (realtime level-0)."""
        from seekstorm_spark.query.engine import search

        return search(
            self.spark, self.store, query, staged=self.staged or None,
            **kwargs,
        )

    def count(self, query: str, default_type: str = "union") -> int:
        from seekstorm_spark.query.engine import count_matches

        return count_matches(
            self.spark, self.store, query, default_type,
            staged=self.staged or None,
        )

    def commit(self) -> IndexStore:
        import os
        import time

        had_batches = bool(self.staged)
        for staged in self.staged:
            self.store = commit_batch(self.spark, self.store, staged)
        self.staged = []
        self._pending = 0
        self._last_commit = time.monotonic()
        # a commit moves the index generation, which invalidates any
        # frequent-term result cache — rebuild it so cached serving
        # resumes immediately (the reference rebuilds its result cache
        # per commit, index.rs:1644)
        if had_batches and os.path.isdir(
            os.path.join(self.store.path, "result_cache")
        ):
            from seekstorm_spark.query.result_cache import (
                rebuild_result_cache,
            )

            rebuild_result_cache(self.spark, self.store)
        return self.store


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
