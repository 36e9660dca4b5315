"""Distributed inverted-index build.

Spark-first re-expression of the reference's write path
(`/root/reference/seekstorm/src/index.rs:5279-5928`,
`commit.rs:109-682`):

1. **docid assignment** — contiguous, deterministic, *distributed*:
   hash docs into buckets, count per bucket (tiny collect), broadcast
   prefix-sum offsets, assign ``offset + local_rank`` per bucket. No
   global ``row_number`` window (which would serialize at 10^12 docs).
   The reference's round-robin ``docid % shards`` (`index.rs:5284`)
   becomes this bucket layout.
2. **tokenize** — one `mapInPandas` pass emitting per-(doc, term)
   rows with tf + positions + the doc's quantized length carried
   along (the reference's `unique_terms` map, `tokenizer.rs:653-671`).
   Carrying dl on every term row denormalizes ~1 byte/posting but
   removes the N-row doc-length join at both build and query time —
   the reference makes the same trade with its in-RAM per-shard
   doc-length array (`index.rs:5840-5850`).
3. **posting blocks** — ``groupBy(term, block_id).applyInPandas``:
   each task handles ≤65,536 docids (`ROARING_BLOCK_SIZE`,
   `index.rs:114-115`), so even a stopword's posting list splits into
   bounded tasks — the block structure *is* the skew salt.
4. **stats + block-max metadata** — df per term, SmallFloat-quantized
   doc lengths, avgdl (`commit.rs:318-319`), per-block max BM25 tf
   component for WAND (`compress_postinglist.rs:530-676`).
5. **lineage** — per-bucket metrics; an interrupted build resumes by
   anti-joining pending buckets against committed lineage (the
   reference's incomplete-level truncate+rewrite, `commit.rs:203-258`).
"""

from __future__ import annotations

import json
import os
import time
from collections.abc import Iterator
from typing import Any

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from seekstorm_spark.codecs import (
    ROARING_BLOCK_SIZE,
    encode_docids,
    encode_positions,
    encode_tfs,
)
from seekstorm_spark.index.store import IndexStore
from seekstorm_spark.quantization import decode_lengths, encode_lengths
from seekstorm_spark.scoring import B, K
from seekstorm_spark.tokenizer import tokenize_doc

TERM_ROW_SCHEMA = (
    "docid long, term string, tf int, positions array<int>, dl_byte int"
)

POSTING_SCHEMA = (
    "term string, block_id int, posting_count int, max_tf_comp float, "
    "docids_vb binary, tfs_vb binary, dls binary, positions_vb binary"
)


def assign_docids(
    docs: DataFrame,
    order_col: str,
    n_buckets: int = 64,
    id_col: str | None = None,
) -> DataFrame:
    """Add a contiguous ``docid`` column, deterministically, without a
    global sort. If ``id_col`` is given it is trusted as a unique
    0-based long id (the driver testdata ships one)."""
    if id_col is not None:
        return docs.withColumn("docid", F.col(id_col).cast("long"))

    docs = docs.withColumn(
        "_bucket", F.pmod(F.xxhash64(F.col(order_col)), F.lit(n_buckets)).cast("int")
    )
    counts = {
        r["_bucket"]: r["cnt"]
        for r in docs.groupBy("_bucket").agg(F.count("*").alias("cnt")).collect()
    }
    offsets: dict[int, int] = {}
    acc = 0
    for b in range(n_buckets):
        offsets[b] = acc
        acc += counts.get(b, 0)

    from pyspark.sql.types import LongType, StructField, StructType

    out_schema = StructType(
        list(docs.schema.fields) + [StructField("docid", LongType())]
    )

    def _assign(key: tuple, pdf: pd.DataFrame) -> pd.DataFrame:
        b = int(key[0])
        pdf = pdf.sort_values(order_col, kind="mergesort").reset_index(drop=True)
        pdf["docid"] = np.arange(len(pdf), dtype=np.int64) + offsets[b]
        return pdf

    return (
        docs.groupBy("_bucket")
        .applyInPandas(_assign, schema=out_schema)
        .drop("_bucket")
    )


def tokenize_to_term_rows(
    docs: DataFrame,
    text_col: str = "text",
    tokenizer: str = "unicode_alphanumeric",
    stop_words: frozenset[str] | None = None,
) -> DataFrame:
    """docs(docid, text) → term rows; one sentinel row per doc
    (term='') carries the doc length so empty docs stay counted."""
    tokenizer_name = tokenizer
    stops = stop_words

    def _tok(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            docids: list[int] = []
            terms: list[str] = []
            tfs: list[int] = []
            poss: list[list[int]] = []
            dls: list[int] = []
            for docid, text in zip(pdf["docid"].values, pdf[text_col].values):
                tmap, count = tokenize_doc(text or "", tokenizer_name, stops)
                dl_byte = int(encode_lengths(np.array([count]))[0])
                docids.append(docid)
                terms.append("")
                tfs.append(0)
                poss.append([])
                dls.append(dl_byte)
                for term, positions in tmap.items():
                    docids.append(docid)
                    terms.append(term)
                    tfs.append(len(positions))
                    poss.append(positions)
                    dls.append(dl_byte)
            yield pd.DataFrame(
                {
                    "docid": pd.Series(docids, dtype="int64"),
                    "term": terms,
                    "tf": pd.Series(tfs, dtype="int32"),
                    "positions": poss,
                    "dl_byte": pd.Series(dls, dtype="int32"),
                }
            )

    return docs.select("docid", text_col).mapInPandas(_tok, schema=TERM_ROW_SCHEMA)


def build_posting_blocks(term_rows: DataFrame, avgdl: float) -> DataFrame:
    """(term, block) groups → compressed posting rows.

    The group key (term, block_id) bounds every task at 65,536 docids —
    the reference's block structure (`index.rs:114-115`) doing double
    duty as skew handling: a stopword with 10^9 postings becomes ~15k
    independent bounded tasks, not one hot key.
    """
    avgdl_f = np.float32(avgdl)

    def _build(key: tuple, pdf: pd.DataFrame) -> pd.DataFrame:
        term, block_id = key[0], int(key[1])
        pdf = pdf.sort_values("docid", kind="mergesort")
        docids = pdf["docid"].values.astype(np.int64)
        local = (docids & (ROARING_BLOCK_SIZE - 1)).astype(np.int64)
        tfs = pdf["tf"].values.astype(np.int64)
        dl_bytes = pdf["dl_byte"].values.astype(np.uint8)
        dl_q = decode_lengths(dl_bytes).astype(np.float32)
        # block-max BM25 tf component in f32 (idf multiplied at query
        # plan time; f32 multiply is monotone so the bound is admissible)
        tf32 = tfs.astype(np.float32)
        comp = tf32 * np.float32(K + 1.0) / (
            tf32
            + np.float32(K)
            * (np.float32(1.0) - np.float32(B) + np.float32(B) * dl_q / avgdl_f)
        )
        flat_pos = (
            np.concatenate(pdf["positions"].values)
            if len(pdf)
            else np.empty(0, dtype=np.int64)
        )
        return pd.DataFrame(
            {
                "term": [term],
                "block_id": pd.Series([block_id], dtype="int32"),
                "posting_count": pd.Series([len(docids)], dtype="int32"),
                "max_tf_comp": pd.Series([float(comp.max())], dtype="float32"),
                "docids_vb": [encode_docids(local)],
                "tfs_vb": [encode_tfs(tfs)],
                "dls": [dl_bytes.tobytes()],
                "positions_vb": [encode_positions(flat_pos, tfs)],
            }
        )

    blocks = term_rows.withColumn(
        "block_id", (F.col("docid") / F.lit(ROARING_BLOCK_SIZE)).cast("int")
    )
    return blocks.groupBy("term", "block_id").applyInPandas(
        _build, schema=POSTING_SCHEMA
    )


class IndexBuilder:
    def __init__(
        self,
        spark: SparkSession,
        index_path: str,
        tokenizer: str = "unicode_alphanumeric",
        stop_words: frozenset[str] | None = None,
        n_buckets: int = 32,
    ):
        self.spark = spark
        self.index_path = index_path
        self.tokenizer = tokenizer
        self.stop_words = stop_words
        self.n_buckets = n_buckets

    def build(
        self,
        docs: DataFrame,
        text_col: str = "text",
        id_col: str | None = None,
        order_col: str | None = None,
        only_buckets: list[int] | None = None,
        resume: bool = False,
    ) -> IndexStore:
        """Build (or resume) the index from a documents DataFrame.

        ``only_buckets`` restricts the postings write to a subset of
        term buckets (used by tests to simulate an interrupted build);
        ``resume=True`` builds only buckets absent from lineage.
        """
        spark = self.spark
        t0 = time.time()
        store = IndexStore(path=self.index_path)
        os.makedirs(self.index_path, exist_ok=True)

        docs = assign_docids(
            docs, order_col=order_col or text_col, id_col=id_col,
            n_buckets=max(self.n_buckets, 16),
        )

        term_rows = tokenize_to_term_rows(
            docs, text_col, self.tokenizer, self.stop_words
        ).cache()

        # --- doc_meta + global stats (reference commit.rs:264-325) ---
        doc_meta = term_rows.filter(F.col("term") == "").select(
            "docid", "dl_byte"
        )
        doc_meta.write.mode("overwrite").parquet(store.doc_meta_path)
        doc_meta = spark.read.parquet(store.doc_meta_path)

        agg = doc_meta.agg(
            F.count("*").alias("n"),
        ).collect()[0]
        n_docs = int(agg["n"])
        # positions_sum_normalized = sum of decompressed quantized
        # lengths; avgdl divides by doc count (commit.rs:318-319), f32.
        dl_hist = {
            int(r["dl_byte"]): int(r["cnt"])
            for r in doc_meta.groupBy("dl_byte")
            .agg(F.count("*").alias("cnt"))
            .collect()
        }
        pos_sum = int(
            sum(int(decode_lengths(np.array([b]))[0]) * c for b, c in dl_hist.items())
        )
        avgdl = float(np.float32(pos_sum) / np.float32(n_docs)) if n_docs else 1.0

        # --- posting blocks, bucketed by term hash ---
        postings_src = term_rows.filter(F.col("term") != "")
        posting_blocks = build_posting_blocks(postings_src, avgdl).withColumn(
            "tbucket",
            F.pmod(F.xxhash64(F.col("term")), F.lit(self.n_buckets)).cast("int"),
        )

        committed: set[int] = set()
        if resume and os.path.exists(store.lineage_path):
            committed = {
                int(r["tbucket"])
                for r in spark.read.parquet(store.lineage_path)
                .select("tbucket")
                .distinct()
                .collect()
            }
        targets = [
            b
            for b in (only_buckets or range(self.n_buckets))
            if b not in committed
        ]
        if len(targets) < self.n_buckets:
            posting_blocks = posting_blocks.filter(
                F.col("tbucket").isin([int(b) for b in targets])
            )

        mode = "append" if (resume or only_buckets) and os.path.exists(
            store.postings_path
        ) else "overwrite"
        (
            posting_blocks.repartition(
                max(spark.sparkContext.defaultParallelism, 8), "tbucket", "term"
            )
            .sortWithinPartitions("term", "block_id")
            .write.mode(mode)
            .partitionBy("tbucket")
            .parquet(store.postings_path)
        )

        postings = spark.read.parquet(store.postings_path)

        # --- term stats (list heads: df, cf, list-max component) ---
        term_stats = postings.groupBy("tbucket", "term").agg(
            F.sum("posting_count").cast("long").alias("df"),
            F.count("*").cast("int").alias("n_blocks"),
            F.max("max_tf_comp").alias("max_tf_comp"),
        )
        term_stats.write.mode("overwrite").partitionBy("tbucket").parquet(
            store.term_stats_path
        )

        # --- lineage (per-bucket commit record) ---
        lineage = (
            postings.filter(F.col("tbucket").isin([int(b) for b in targets]))
            .groupBy("tbucket")
            .agg(
                F.count("*").cast("long").alias("n_blocks"),
                F.countDistinct("term").cast("long").alias("n_terms"),
                F.sum("posting_count").cast("long").alias("n_postings"),
                (
                    F.sum(F.length("docids_vb"))
                    + F.sum(F.length("tfs_vb"))
                    + F.sum(F.length("dls"))
                    + F.sum(F.length("positions_vb"))
                ).cast("long").alias("bytes"),
            )
            .withColumn("committed_at", F.current_timestamp())
            .withColumn("build_wall_s", F.lit(float(time.time() - t0)))
        )
        lineage.write.mode(
            "append" if (resume or only_buckets) and os.path.exists(store.lineage_path)
            else "overwrite"
        ).parquet(store.lineage_path)

        term_rows.unpersist()

        store.meta = {
            "version": 1,
            "tokenizer": self.tokenizer,
            "stop_words": sorted(self.stop_words) if self.stop_words else [],
            "n_docs": n_docs,
            "positions_sum_normalized": pos_sum,
            "avgdl": avgdl,
            "n_buckets": self.n_buckets,
            "block_size": ROARING_BLOCK_SIZE,
            "built_at": time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime()),
            "complete": only_buckets is None or resume,
        }
        store.write_meta()
        return store


def load_or_build(
    spark: SparkSession,
    docs: DataFrame,
    index_path: str,
    builder_kwargs: dict[str, Any] | None = None,
    build_kwargs: dict[str, Any] | None = None,
) -> IndexStore:
    meta = os.path.join(index_path, "meta.json")
    if os.path.exists(meta):
        with open(meta) as f:
            if json.load(f).get("complete"):
                return IndexStore.open(index_path)
    return IndexBuilder(spark, index_path, **(builder_kwargs or {})).build(
        docs, **(build_kwargs or {})
    )
