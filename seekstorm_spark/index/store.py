"""On-disk index layout + read-side access.

The index is a set of Parquet/Iceberg-style tables under one directory
(the Spark analog of the reference's per-shard ``index.bin`` layout,
`/root/reference/seekstorm/src/commit.rs:264-331`):

* ``meta.json``     — tokenizer config, N, avgdl, bucket count.
* ``doc_meta/``     — one row per doc: docid, external id, dl_raw,
                      dl_byte (SmallFloat, `index.rs:4232-4279`).
* ``postings/``     — one row per (term, block); hash-partitioned by
                      ``tbucket`` (the Spark analog of the reference's
                      2048 term-hash segments, `index.rs:988-995`);
                      65,536-docid blocks (`index.rs:114-115`) with
                      delta+VB docids, VB tfs, raw dl bytes, VB
                      positions, and the block-max tf component for
                      WAND pruning (`compress_postinglist.rs:530-676`).
* ``term_stats/``   — list heads: term, df, cf, list-max component.
* ``lineage/``      — per-bucket build metrics + commit timestamps;
                      resume anti-joins pending buckets against this
                      (reference resumes by truncating the incomplete
                      last level, `commit.rs:203-258`).
"""

from __future__ import annotations

import json
import os
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession

# Explicit on-disk table schemas (must mirror the writer schemas in
# builder.py — POSTING_SCHEMA / _decode_doc_meta /
# term_stats_aggregate / encode_facet_blocks; a structural pytest
# pins the two sides together). Passing them to every read (a) skips
# parquet schema inference per query and (b) keeps EMPTY tables
# readable — a zero-doc build writes no data files, and inference
# cannot name columns that aren't there.
POSTINGS_DDL = (
    "term string, field int, block_id int, posting_count int, "
    "df_block int, max_tf int, min_dl_byte int, docids_vb binary, "
    "tfs_vb binary, dls binary, positions_vb binary, "
    "tfs1_vb binary, tfs2_vb binary, tfs3_vb binary, "
    "max_tf1 int, max_tf2 int, max_tf3 int, tbucket int"
)
DOC_META_DDL = "docid long, field int, dl_byte int"
TERM_STATS_DDL = (
    "term string, df long, cf_fields long, n_blocks int, max_tf int, "
    "min_dl_byte int, bytes long, tbucket int"
)
FACETS_DDL = (
    "block_id int, fvalues binary, vmin double, vmax double, "
    "facet string"
)


@dataclass
class IndexStore:
    path: str
    meta: dict = field(default_factory=dict)

    # --- paths ---
    @property
    def meta_path(self) -> str:
        return os.path.join(self.path, "meta.json")

    @property
    def doc_meta_path(self) -> str:
        return os.path.join(self.path, "doc_meta")

    @property
    def postings_path(self) -> str:
        return os.path.join(self.path, "postings")

    @property
    def term_stats_path(self) -> str:
        return os.path.join(self.path, "term_stats")

    @property
    def lineage_path(self) -> str:
        return os.path.join(self.path, "lineage")

    @property
    def deletes_path(self) -> str:
        return os.path.join(self.path, "deletes")

    @property
    def facets_path(self) -> str:
        return os.path.join(self.path, "facets")

    # --- lifecycle ---
    @classmethod
    def open(cls, path: str) -> "IndexStore":
        with open(os.path.join(path, "meta.json")) as f:
            meta = json.load(f)
        return cls(path=path, meta=meta)

    def write_meta(self) -> None:
        os.makedirs(self.path, exist_ok=True)
        with open(self.meta_path, "w") as f:
            json.dump(self.meta, f, indent=2)

    # --- readers ---
    def doc_meta(self, spark: SparkSession) -> DataFrame:
        return spark.read.schema(DOC_META_DDL).parquet(self.doc_meta_path)

    def postings(self, spark: SparkSession) -> DataFrame:
        return spark.read.schema(POSTINGS_DDL).parquet(self.postings_path)

    def term_stats(self, spark: SparkSession) -> DataFrame:
        return spark.read.schema(TERM_STATS_DDL).parquet(
            self.term_stats_path
        )

    def lineage(self, spark: SparkSession) -> DataFrame:
        return spark.read.parquet(self.lineage_path)

    def facet_blocks(self, spark: SparkSession) -> DataFrame:
        return spark.read.schema(FACETS_DDL).parquet(self.facets_path)

    @property
    def n_docs(self) -> int:
        return int(self.meta["n_docs"])

    @property
    def avgdl(self) -> float:
        return float(self.meta["avgdl"])

    @property
    def n_buckets(self) -> int:
        return int(self.meta["n_buckets"])
