"""Columnar doc store: high-QPS driver-side field retrieval.

The reference serves ``get_document`` from per-shard doc stores —
zstd-compressed stored fields addressed by docid
(`/root/reference/seekstorm/src/doc_store.rs`) — at microsecond
latency. A Spark job per point lookup pays the ~0.5 s scheduling
floor, so the Spark-side analog splits write and read:

* WRITE (one Spark job): a docid-bucketed parquet table —
  ``dbucket = docid // docs_per_bucket`` partition directories, rows
  sorted by docid within each file. At 10^12 docs the bucket count
  scales with the corpus while every file stays bounded, and a point
  lookup addresses exactly one bucket ARITHMETICALLY (no listing of
  the full table).
* READ (no Spark job): driver-side pyarrow. docid → bucket dir →
  row group via parquet min/max stats → LRU-cached DECODED batch.
  Hot row groups stay resident in Arrow columnar form, so a warm
  lookup is a binary search + row slice — no file IO, no Spark job.
  The file listing per bucket dir is mtime-keyed, so streaming
  appends into a bucket invalidate only that bucket's entry.

``search(...)`` → top-k docids → ``DocStore.get_many`` is the
serving-path analog of the reference's result-to-document join
(`search.rs:1875-2122` feeding `doc_store.rs` reads).
"""

from __future__ import annotations

import json
import os
from collections import OrderedDict

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

DOC_STORE_VERSION = 1
_META_NAME = "_docstore_meta.json"


def write_doc_store(
    docs: DataFrame,
    path: str,
    id_col: str = "docid",
    fields: list[str] | None = None,
    docs_per_bucket: int = 1 << 20,
    mode: str = "overwrite",
    compression: str = "snappy",
) -> None:
    """Write ``docs`` as a docid-bucketed columnar doc store.

    ``fields`` defaults to every column except ``id_col``. Rows land
    in ``dbucket=K/`` partition dirs sorted by docid; the write
    repartitions BY THE PARTITION COLUMN first so each task writes one
    directory (the many-partition file-create tail does not scale
    otherwise). ``mode="append"`` adds new buckets/files for appended
    docs — readers pick them up via per-bucket-dir mtime keys.
    ``compression`` maps to the parquet codec — ``snappy`` (default),
    ``zstd``, ``gzip``, ``lz4``, or ``none``/``uncompressed`` — the
    reference's per-store None/Lz4/Zstd compression choice
    (doc_store.rs); readers are codec-agnostic.
    """
    cols = fields or [c for c in docs.columns if c != id_col]
    meta_path = os.path.join(path, _META_NAME)
    if mode == "append" and os.path.exists(meta_path):
        # An append must not silently change the store's contract —
        # older files wouldn't have the new columns and point reads
        # would fail on them. Validate instead of overwriting.
        with open(meta_path) as f:
            prior = json.load(f)
        if int(prior.get("docs_per_bucket", -1)) != int(docs_per_bucket):
            raise ValueError(
                f"doc store append with docs_per_bucket={docs_per_bucket} "
                f"!= existing {prior.get('docs_per_bucket')}"
            )
        if fields is not None and list(fields) != list(prior.get("fields", [])):
            raise ValueError(
                f"doc store append with fields={list(fields)} != existing "
                f"{prior.get('fields')}"
            )
        cols = list(prior["fields"])
    out = (
        docs.select(
            F.col(id_col).cast("long").alias("docid"),
            *[F.col(c) for c in cols],
        )
        .withColumn(
            "dbucket",
            (F.col("docid") / F.lit(int(docs_per_bucket))).cast("long"),
        )
        .repartition("dbucket")
        .sortWithinPartitions("docid")
    )
    codec = {"none": "uncompressed"}.get(compression, compression)
    out.write.mode(mode).option("compression", codec).partitionBy(
        "dbucket"
    ).parquet(path)
    meta = {
        "version": DOC_STORE_VERSION,
        "docs_per_bucket": int(docs_per_bucket),
        "fields": cols,
    }
    with open(meta_path, "w") as f:
        json.dump(meta, f)


class DocStore:
    """Driver-side point-lookup reader over a bucketed doc store.

    ``cache_groups`` bounds the decoded row-group LRU (the columnar
    cache). File handles and row-group docid ranges are cached per
    file; the file listing per bucket dir is keyed on the dir's mtime
    so appends invalidate exactly the touched bucket.
    """

    def __init__(self, path: str, cache_groups: int = 64):
        with open(os.path.join(path, _META_NAME)) as f:
            meta = json.load(f)
        if meta.get("version") != DOC_STORE_VERSION:
            raise ValueError(
                f"doc store at {path} has version {meta.get('version')}, "
                f"reader supports {DOC_STORE_VERSION}"
            )
        self.path = path
        self.docs_per_bucket = int(meta["docs_per_bucket"])
        self.fields = list(meta["fields"])
        self._cache_groups = cache_groups
        # (bucket → (dir mtime, [file paths]))
        self._bucket_files: dict[int, tuple[float, list[str]]] = {}
        # file → (ParquetFile, [(rg_min, rg_max), ...])
        self._files: dict[str, tuple] = {}
        # (file, rg_index) → decoded pyarrow table (LRU)
        self._groups: OrderedDict[tuple[str, int], object] = OrderedDict()

    # --- internals ---
    def _files_for_bucket(self, bucket: int) -> list[str]:
        d = os.path.join(self.path, f"dbucket={bucket}")
        try:
            mtime = os.stat(d).st_mtime
        except FileNotFoundError:
            return []
        got = self._bucket_files.get(bucket)
        if got is not None and got[0] == mtime:
            return got[1]
        files = sorted(
            os.path.join(d, f)
            for f in os.listdir(d)
            if f.endswith(".parquet")
        )
        self._bucket_files[bucket] = (mtime, files)
        # drop stale handles for files that vanished (compaction)
        for known in [f for f in self._files if f.startswith(d + os.sep)]:
            if known not in files:
                del self._files[known]
        return files

    def _open(self, fpath: str):
        got = self._files.get(fpath)
        if got is not None:
            return got
        import pyarrow.parquet as pq

        pf = pq.ParquetFile(fpath)
        ranges = []
        for i in range(pf.metadata.num_row_groups):
            st = pf.metadata.row_group(i).column(0).statistics
            if st is not None and st.has_min_max:
                ranges.append((int(st.min), int(st.max)))
            else:
                ranges.append((None, None))
        got = (pf, ranges)
        self._files[fpath] = got
        return got

    def _group(self, fpath: str, rg: int):
        key = (fpath, rg)
        tbl = self._groups.get(key)
        if tbl is not None:
            self._groups.move_to_end(key)
            return tbl
        pf, _ranges = self._open(fpath)
        t = pf.read_row_group(rg, columns=["docid", *self.fields])
        # docids decoded once per cached group: a warm lookup is one
        # numpy binary search + one row slice
        tbl = (t, t.column("docid").to_numpy())
        self._groups[key] = tbl
        while len(self._groups) > self._cache_groups:
            self._groups.popitem(last=False)
        return tbl

    def _lookup(self, docid: int) -> dict | None:
        import numpy as np

        bucket = docid // self.docs_per_bucket
        for fpath in self._files_for_bucket(bucket):
            _pf, ranges = self._open(fpath)
            for rg, (lo, hi) in enumerate(ranges):
                if lo is not None and (docid < lo or docid > hi):
                    continue  # row-group stats prune
                t, ids = self._group(fpath, rg)
                i = int(np.searchsorted(ids, docid))
                if i < len(ids) and ids[i] == docid:
                    row = {"docid": docid}
                    for c in self.fields:
                        row[c] = t.column(c)[i].as_py()
                    return row
        return None

    # --- API ---
    def get(self, docid: int) -> dict | None:
        """Stored fields for one docid, or None if absent."""
        return self._lookup(int(docid))

    def get_many(self, docids: list[int]) -> list[dict | None]:
        """Point lookups for many docids, input order preserved.
        Lookups within one call share the warm row-group cache."""
        return [self._lookup(int(d)) for d in docids]


def compact_doc_store(spark, path: str, delete_docids) -> int:
    """Remove ``delete_docids`` from the store by rewriting ONLY the
    buckets that contain them (the index's ``compact()`` counterpart
    for stored fields). Untouched bucket directories keep their files
    byte-for-byte — at 10^12 docs a deletion wave touches a bounded
    set of buckets, not the table. Buckets left empty are removed.
    Returns the number of buckets rewritten. Readers pick up the new
    files via their per-bucket mtime keys."""
    import shutil

    from pyspark.sql import functions as F

    with open(os.path.join(path, _META_NAME)) as f:
        meta = json.load(f)
    dpb = int(meta["docs_per_bucket"])
    ids = [int(d) for d in delete_docids]
    buckets = sorted({d // dpb for d in ids})
    if not buckets:
        return 0
    src = spark.read.parquet(path).filter(F.col("dbucket").isin(buckets))
    dele = spark.createDataFrame([(d,) for d in ids], "docid long")
    keep = src.join(F.broadcast(dele), "docid", "left_anti")
    present = {
        int(r["dbucket"])
        for r in keep.select("dbucket").distinct().collect()
    }
    out = (
        keep.repartition("dbucket")
        .sortWithinPartitions("docid")
        .select("docid", *meta["fields"], "dbucket")
    )
    conf = spark.conf
    prev = conf.get("spark.sql.sources.partitionOverwriteMode", "static")
    conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try:
        # dynamic overwrite replaces exactly the buckets present in
        # the output; emptied buckets are removed below
        out.write.mode("overwrite").partitionBy("dbucket").parquet(path)
    finally:
        conf.set("spark.sql.sources.partitionOverwriteMode", prev)
    for b in set(buckets) - present:
        shutil.rmtree(os.path.join(path, f"dbucket={b}"), ignore_errors=True)
    return len(buckets)
