"""Indexed query execution: block-max WAND over the postings table.

Spark-first re-expression of the reference's read path
(`/root/reference/seekstorm/src/search.rs:1154-2131`). A point query
is exactly ONE Spark job:

* query terms → driver-side pyarrow probe of the partitioned
  term-stats table (the reference's in-RAM segment-dictionary probe,
  `search.rs:3066-3303`) — no Spark pre-job; 2-term frequent phrases
  rewrite to their pre-joined n-gram posting (`NGRAM_SEARCH.md`);
* partition-pruned postings scan — only the query terms' ``tbucket``
  parquet partitions are read, with pushed-down term (and field)
  filters; term idf/flags are literal expressions, not a join;
* blocks that cannot contain a top-k doc are skipped via per-block
  score bounds computed at query time from (max_tf, min_dl) and the
  live avgdl (block-max WAND, reference `intersection.rs:2224-2233`,
  `single.rs:372-386`, metadata `compress_postinglist.rs:530-676`) —
  a ``mapInPandas`` kernel with a per-partition threshold heap, blocks
  visited in bound-descending order; facet filters apply inside the
  kernel from per-block facet byte arrays (`search.rs:2543-2726`);
* AND = multi-way sorted intersection over per-term field unions
  (`intersection.rs:112-2022`; numpy ``intersect1d`` replaces the
  hand-rolled SIMD/galloping); OR = k-way union with per-doc BM25F
  score sum (`union.rs:32-1166`, `add_result.rs:1171-1426`);
  NOT = anti-probe (`add_result.rs:3005-3062`); phrase = AND +
  position-offset alignment within a field (`add_result.rs:3152-3391`);
* global top-k = per-partition heaps → ``orderBy(score, docid).limit``
  (the reference's shard-merge, `search.rs:1875-2122`); multi-key
  result sorts switch the kernel to emit-all (`min_heap.rs:56-546`).
"""

from __future__ import annotations

from collections.abc import Iterator
from dataclasses import dataclass

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from seekstorm_spark.codecs import (
    ROARING_BLOCK_SIZE,
    decode_docids,
    decode_positions,
    decode_tfs,
)
from seekstorm_spark.hashing import term_bucket
from seekstorm_spark.index.store import IndexStore
from seekstorm_spark.quantization import _DECODE_NP
from seekstorm_spark.scoring import B, K, idf_f32
from seekstorm_spark.tokenizer import ParsedQuery, parse_query

RESULT_SCHEMA = "docid long, score float"
COUNT_SCHEMA = "matches long"

# per-index probed term stats: {(path, mtime): {"df": {term: df},
# "missing": set()}}. The probe reads ONLY the query terms' tbucket
# partition files with pyarrow on the driver — no Spark job, and the
# read is bounded by vocabulary/n_buckets regardless of corpus size
# (the reference's in-RAM segment dictionary probe, search.rs:3066-3303).
_TERM_STATS_CACHE: dict[tuple, dict] = {}
# per-index cached delete sets: {(path, mtime): np.ndarray}
_DELETE_CACHE: dict[tuple, np.ndarray] = {}
# per-(session, index generation) cached postings reader DataFrames —
# reusing the DataFrame reuses its resolved file index, saving the
# ~0.4 s directory listing + schema inference EVERY query would
# otherwise pay
_READER_CACHE: dict[tuple, DataFrame] = {}


def _cached_postings(spark: SparkSession, store: IndexStore) -> DataFrame:
    key = (id(spark), store.path, _dir_mtime(store.postings_path))
    df = _READER_CACHE.get(key)
    if df is None:
        df = store.postings(spark)
        _READER_CACHE[key] = df
    return df


def _dir_mtime(path: str) -> float:
    import os

    try:
        return os.path.getmtime(path)
    except OSError:
        return -1.0


def _probe_term_stats(store: IndexStore, terms: list[str]) -> dict[str, int]:
    """term → df for the terms present in the index (driver-side
    partition-pruned parquet probe; cached per index generation)."""
    if not terms:
        return {}
    key = (store.path, _dir_mtime(store.term_stats_path))
    entry = _TERM_STATS_CACHE.setdefault(key, {"df": {}, "missing": set()})
    need = [t for t in terms if t not in entry["df"] and t not in entry["missing"]]
    if need:
        import pyarrow.compute as pc
        import pyarrow.dataset as pads

        buckets = sorted({term_bucket(t, store.n_buckets) for t in need})
        dataset = pads.dataset(store.term_stats_path, partitioning="hive")
        tbl = dataset.to_table(
            columns=["term", "df"],
            filter=pc.field("tbucket").isin(buckets) & pc.field("term").isin(need),
        )
        found = dict(
            zip(tbl.column("term").to_pylist(), tbl.column("df").to_pylist())
        )
        entry["df"].update({t: int(v) for t, v in found.items()})
        entry["missing"].update(t for t in need if t not in found)
    return {t: entry["df"][t] for t in terms if t in entry["df"]}


def invalidate_term_stats_cache(path: str | None = None) -> None:
    if path is None:
        _TERM_STATS_CACHE.clear()
        _DELETE_CACHE.clear()
        _READER_CACHE.clear()
    else:
        for cache in (_TERM_STATS_CACHE, _DELETE_CACHE):
            for k in [k for k in cache if k[0] == path]:
                cache.pop(k, None)
        for k in [k for k in _READER_CACHE if k[1] == path]:
            _READER_CACHE.pop(k, None)


@dataclass
class QueryPlan:
    qtype: str  # union | intersection | phrase | ngram2
    pos_terms: dict[str, float]  # term -> f32 idf
    not_terms: list[str]
    phrase: list[tuple[str, int]]  # (term, offset) incl. duplicates
    missing_required: bool
    # phrase→n-gram rewrite (NGRAM_SEARCH.md, tokenizer.rs:673-1387):
    # the 2-term phrase's posting list IS the pre-joined adjacency
    # match; partial-term tfs ride the posting for faithful BM25
    ngram_key: str | None = None


def _plan(
    spark: SparkSession, store: IndexStore, query: str, default_type: str
) -> QueryPlan:
    meta = store.meta
    stop_words = frozenset(meta.get("stop_words") or []) or None
    pq: ParsedQuery = parse_query(
        query,
        default_type,
        meta.get("tokenizer", "unicode_alphanumeric"),
        stop_words,
        meta.get("stemmer"),
    )
    pos = sorted({t.term for t in pq.positive_terms})
    nots = sorted({t.term for t in pq.not_terms})
    phrase = [(t.term, t.phrase_index) for t in pq.terms if t.op == "phrase"]
    all_terms = sorted(set(pos) | set(nots))
    if not all_terms:
        return QueryPlan(pq.query_type, {}, [], [], False)

    # phrase → n-gram rewrite: a 2-term phrase of distinct FREQUENT
    # terms with no NOT terms reads the pre-joined n-gram posting
    # instead of intersecting two long stopword lists
    frequent = frozenset(meta.get("frequent_terms") or [])
    if (
        pq.query_type == "phrase"
        and frequent
        and len(phrase) == 2
        and not nots
        and phrase[0][1] == 0
        and phrase[1][1] == 1
        and phrase[0][0] != phrase[1][0]
        and phrase[0][0] in frequent
        and phrase[1][0] in frequent
    ):
        from seekstorm_spark.index.builder import NGRAM_SEP

        t1, t2 = phrase[0][0], phrase[1][0]
        ng_key = t1 + NGRAM_SEP + t2
        stats = _probe_term_stats(store, [ng_key, t1, t2])
        if t1 in stats and t2 in stats:
            if ng_key not in stats:
                # pair never adjacent anywhere → empty result
                return QueryPlan("ngram2", {}, [], [], True)
            pos_idf = {
                t: float(idf_f32(store.n_docs, stats[t])) for t in (t1, t2)
            }
            return QueryPlan(
                qtype="ngram2",
                pos_terms=pos_idf,
                not_terms=[],
                phrase=phrase,
                missing_required=False,
                ngram_key=ng_key,
            )

    df_by_term = _probe_term_stats(store, all_terms)
    pos_idf = {
        t: float(idf_f32(store.n_docs, df_by_term[t]))
        for t in pos
        if t in df_by_term
    }
    missing = any(t not in df_by_term for t in pos)
    missing_required = missing and pq.query_type in ("intersection", "phrase")
    return QueryPlan(
        qtype=pq.query_type,
        pos_terms=pos_idf,
        not_terms=[t for t in nots if t in df_by_term],
        phrase=phrase,
        missing_required=missing_required,
    )


def _resolve_fields(
    store: IndexStore,
    fields: list[tuple[str, float]] | None,
    field_filter: list[str] | None,
) -> tuple[dict[int, float], list[int] | None]:
    """(field id → boost, allowed field ids or None=all).

    ``fields`` sets per-field boosts (reference FieldBoost,
    add_result.rs:1171-1426); ``field_filter`` restricts matching AND
    scoring to the named fields (search.rs:2483-2495) while df/idf
    stay corpus-wide."""
    names = list(store.meta.get("fields") or ["text"])
    boosts = {i: 1.0 for i in range(len(names))}
    if fields:
        for name, b in fields:
            if name not in names:
                raise ValueError(f"unknown field {name!r}; indexed: {names}")
            boosts[names.index(name)] = float(b)
    allowed = None
    if field_filter:
        allowed = sorted(names.index(n) for n in field_filter)
    return boosts, allowed


def _resolve_facets(
    store: IndexStore,
    facet_filters: dict[str, list[str]] | None,
    result_sort: list[tuple[str, str]] | None,
) -> tuple[dict[str, np.ndarray], list[str], dict[str, list[str]]]:
    """(facet → allowed byte values, facets the kernel must emit,
    facet dictionaries). Facet bytes index the SORTED value dictionary
    written at build time (build_facet_blocks)."""
    dicts: dict[str, list[str]] = store.meta.get("facets") or {}
    filters_b: dict[str, np.ndarray] = {}
    for fname, values in (facet_filters or {}).items():
        if fname not in dicts:
            raise ValueError(f"unknown facet {fname!r}; indexed: {list(dicts)}")
        lookup = {v: i for i, v in enumerate(dicts[fname])}
        allowed = sorted(lookup[v] for v in values if v in lookup)
        filters_b[fname] = np.asarray(allowed, dtype=np.uint8)
    emit = []
    for key, _dir in result_sort or []:
        if key in ("score", "docid"):
            continue
        if key not in dicts:
            raise ValueError(f"unknown sort facet {key!r}; indexed: {list(dicts)}")
        emit.append(key)
    return filters_b, emit, dicts


def search(
    spark: SparkSession,
    store: IndexStore,
    query: str,
    top_k: int = 10,
    offset: int = 0,
    default_type: str = "union",
    prune: bool = True,
    fields: list[tuple[str, float]] | None = None,
    field_filter: list[str] | None = None,
    facet_filters: dict[str, list[str]] | None = None,
    result_sort: list[tuple[str, str]] | None = None,
) -> DataFrame:
    """Top-k BM25(F) search → DataFrame(docid[, sort facets…], score),
    score f32. ``prune=False`` disables the WAND threshold (used to
    verify pruning is lossless). ``fields`` sets per-field boosts;
    ``field_filter`` restricts match+score fields; ``facet_filters``
    restricts results to docs whose facet value is in the allowed list
    (applied INSIDE the kernel via per-block facet byte arrays, so
    top-k pruning stays admissible — reference search.rs:2543-2726);
    ``result_sort`` orders by facet/score/docid keys (multi-key sort,
    reference min_heap.rs:56-546) — pruning is disabled then, since a
    non-score primary key invalidates the score threshold."""
    plan = _plan(spark, store, query, default_type)
    if plan.missing_required or not plan.pos_terms:
        return spark.createDataFrame([], RESULT_SCHEMA)

    boosts, allowed = _resolve_fields(store, fields, field_filter)
    filters_b, emit_facets, dicts = _resolve_facets(
        store, facet_filters, result_sort
    )
    need_facets = sorted(set(filters_b) | set(emit_facets))
    rows = _annotated_postings(
        spark, store, plan, boosts, allowed, facet_cols=need_facets
    )
    need_k = top_k + offset
    emit_all = bool(result_sort)

    kernel = _make_kernel(
        plan, need_k, prune and not emit_all, store.avgdl,
        block_size=int(store.meta.get('block_size', ROARING_BLOCK_SIZE)),
        deletes=_load_delete_set(spark, store),
        facet_filters_b=filters_b,
        emit_facets=emit_facets,
        emit_all=emit_all,
    )
    schema = RESULT_SCHEMA + "".join(f", fb_{fc} int" for fc in emit_facets)
    # rows are already hash-partitioned by block_id (the block-bound
    # window's exchange) — no extra repartition needed
    candidates = rows.sortWithinPartitions(
        F.col("block_bound").desc(), "block_id", "term", "field"
    ).mapInPandas(kernel, schema=schema)

    if result_sort:
        # decode facet bytes → values (sorted dictionary ⇒ byte order
        # is value order), then multi-key sort
        out_cols = [F.col("docid")]
        for fc in emit_facets:
            arr = F.array(*[F.lit(v) for v in dicts[fc]])
            candidates = candidates.withColumn(
                fc,
                F.when(
                    F.col(f"fb_{fc}") == 255, F.lit(None).cast("string")
                ).otherwise(F.element_at(arr, F.col(f"fb_{fc}") + 1)),
            )
            out_cols.append(F.col(fc))
        out_cols.append(F.col("score"))
        order = []
        for key, direction in result_sort:
            col = F.col(key)
            order.append(col.desc() if direction == "desc" else col.asc())
        order.append(F.col("docid").asc())
        out = candidates.select(*out_cols).orderBy(*order)
    else:
        out = candidates.orderBy(F.col("score").desc(), F.col("docid").asc())
    if offset:
        out = out.offset(offset)
    return out.limit(top_k)


def count_matches(
    spark: SparkSession,
    store: IndexStore,
    query: str,
    default_type: str = "union",
    field_filter: list[str] | None = None,
) -> int:
    """Exact match count (ResultType::Count, reference search.rs:168-176).

    Single positive term without NOT/phrase short-circuits to the
    stored df (reference single.rs:313-323) — no scan at all.
    """
    plan = _plan(spark, store, query, default_type)
    if plan.missing_required or not plan.pos_terms:
        return 0
    import os

    has_deletes = os.path.exists(store.deletes_path)
    if (
        len(plan.pos_terms) == 1
        and not plan.not_terms
        and plan.qtype != "phrase"
        and field_filter is None  # stored df counts matches in ANY field
        and not has_deletes  # stored df doesn't reflect the delete set
    ):
        # zero Spark jobs: the stored df IS the count (single.rs:313-323)
        term = next(iter(plan.pos_terms))
        return int(_probe_term_stats(store, [term]).get(term, 0))
    if (
        plan.qtype == "ngram2"
        and field_filter is None
        and not has_deletes
    ):
        # the n-gram's stored df IS the phrase match count
        return int(
            _probe_term_stats(store, [plan.ngram_key]).get(plan.ngram_key, 0)
        )

    boosts, allowed = _resolve_fields(store, None, field_filter)
    rows = _annotated_postings(spark, store, plan, boosts, allowed)
    kernel = _make_kernel(
        plan, 0, False, store.avgdl, count_only=True,
        block_size=int(store.meta.get('block_size', ROARING_BLOCK_SIZE)),
        deletes=_load_delete_set(spark, store),
    )
    out = (
        rows.sortWithinPartitions(
            F.col("block_bound").desc(), "block_id", "term", "field"
        )
        .mapInPandas(kernel, schema=COUNT_SCHEMA)
        .agg(F.sum("matches"))
        .collect()[0][0]
    )
    return int(out or 0)


def browse(
    spark: SparkSession,
    store: IndexStore,
    top_k: int = 10,
    offset: int = 0,
    descending: bool = True,
) -> DataFrame:
    """Empty-query index browse (reference iterator.rs /
    search.rs:1413-1432): all live docids ordered by docid, paged."""
    dm = store.doc_meta(spark).filter(F.col("field") == 0).select("docid")
    dm = _anti_join_deletes(spark, store, dm)
    order = F.col("docid").desc() if descending else F.col("docid").asc()
    out = dm.orderBy(order)
    if offset:
        out = out.offset(offset)
    return out.limit(top_k)


def delete_documents(
    spark: SparkSession, store: IndexStore, docids: list[int]
) -> None:
    """Append docids to the delete set (reference delete.bin,
    `index.rs:5081-5200`): postings stay immutable; results filter at
    query time (`add_result.rs:3000-3002`)."""
    import os

    df = spark.createDataFrame([(int(d),) for d in docids], "docid long")
    mode = "append" if os.path.exists(store.deletes_path) else "overwrite"
    df.write.mode(mode).parquet(store.deletes_path)


def _load_delete_set(spark: SparkSession, store: IndexStore) -> np.ndarray:
    """Delete set as a sorted array for the kernel (the reference keeps
    an in-RAM AHashSet, `index.rs:1593-1594`). Read driver-side with
    pyarrow (no Spark job) and cached per index generation; shipped to
    executors once per query via the kernel closure — broadcast-sized.
    A corpus with massive deletes should compact instead."""
    import os

    if not os.path.exists(store.deletes_path):
        return np.empty(0, dtype=np.int64)
    key = (store.path, _dir_mtime(store.deletes_path))
    cached = _DELETE_CACHE.get(key)
    if cached is None:
        import pyarrow.dataset as pads

        tbl = pads.dataset(store.deletes_path).to_table(columns=["docid"])
        cached = np.unique(tbl.column("docid").to_numpy(zero_copy_only=False))
        _DELETE_CACHE[key] = cached.astype(np.int64)
    return _DELETE_CACHE[key]


def _anti_join_deletes(
    spark: SparkSession, store: IndexStore, df: DataFrame
) -> DataFrame:
    import os

    if not os.path.exists(store.deletes_path):
        return df
    dels = spark.read.parquet(store.deletes_path).select("docid")
    return df.join(F.broadcast(dels), "docid", "left_anti")


def _join_facet_blocks(
    spark: SparkSession,
    store: IndexStore,
    rows: DataFrame,
    facet_cols: list[str],
) -> tuple[DataFrame, list]:
    """Left-join per-block facet byte arrays onto the posting rows
    (rows are hash-partitioned by block_id already, so only the small
    facet side exchanges). Returns (rows, extra select columns)."""
    extra = []
    for fc in facet_cols:
        fb = (
            store.facet_blocks(spark)
            .filter(F.col("facet") == fc)
            .select("block_id", F.col("fvalues").alias(f"fb_{fc}"))
        )
        rows = rows.join(fb, "block_id", "left")
        extra.append(f"fb_{fc}")
    return rows, extra


def _annotated_postings(
    spark: SparkSession,
    store: IndexStore,
    plan: QueryPlan,
    boosts: dict[int, float] | None = None,
    allowed_fields: list[int] | None = None,
    facet_cols: list[str] | None = None,
) -> DataFrame:
    if plan.qtype == "ngram2":
        terms = [plan.ngram_key]
    else:
        terms = sorted(set(plan.pos_terms) | set(plan.not_terms))
    n_buckets = store.n_buckets
    buckets = sorted({term_bucket(t, n_buckets) for t in terms})
    cols = [
        "term",
        "field",
        "block_id",
        "posting_count",
        "max_tf",
        "min_dl_byte",
        "docids_vb",
        "tfs_vb",
        "dls",
    ]
    if plan.qtype == "ngram2":
        cols += ["tfs1_vb", "tfs2_vb", "max_tf1", "max_tf2"]
    if plan.qtype == "phrase":
        cols.append("positions_vb")
    postings = (
        _cached_postings(spark, store)
        .filter(F.col("tbucket").isin(buckets) & F.col("term").isin(terms))
        .select(*cols)
    )
    if allowed_fields is not None:
        # field filter pushes to the scan (reference search.rs:2483-2495)
        postings = postings.filter(
            F.col("field").isin([int(i) for i in allowed_fields])
        )
    if plan.qtype == "phrase":
        postings = postings.withColumnRenamed("positions_vb", "pos_vb")
    else:
        postings = postings.withColumn("pos_vb", F.lit(None).cast("binary"))

    # term metadata as LITERAL expressions (a query touches a handful
    # of terms): no broadcast-join sub-job — a measurable chunk of the
    # per-query latency floor
    idf_expr = F.lit(0.0)
    for t, v in plan.pos_terms.items():
        idf_expr = F.when(F.col("term") == t, F.lit(float(v))).otherwise(
            idf_expr
        )
    rows = postings.withColumn("idf", idf_expr).withColumn(
        "is_not",
        F.col("term").isin(list(plan.not_terms))
        if plan.not_terms
        else F.lit(False),
    )
    n_fields = len(store.meta.get("fields") or ["text"])
    boost_arr = F.array(
        *[
            F.lit(float((boosts or {}).get(i, 1.0)))
            for i in range(max(n_fields, 1))
        ]
    )
    rows = rows.withColumn("boost", F.element_at(boost_arr, F.col("field") + 1))
    # format v2: the block-max bound is computed HERE, at query time,
    # from the current avgdl — comp(max_tf, min_dl) bounds every doc in
    # the block because BM25 tf-saturation is increasing in tf and
    # decreasing in dl (reference compress_postinglist.rs:530-676);
    # valid even when avgdl drifted after the block was written. Per-
    # field rows each contribute boost·idf·comp_ub — an upper bound of
    # the BM25F sum over fields (add_result.rs:1171-1426).
    from seekstorm_spark.quantization import DOCUMENT_LENGTH_COMPRESSION

    dlq_arr = F.array(
        *[F.lit(float(v)) for v in DOCUMENT_LENGTH_COMPRESSION]
    )
    min_dlq = F.element_at(dlq_arr, F.col("min_dl_byte") + 1)

    def _comp_ub(tf_col):
        return (tf_col * F.lit(K + 1.0)) / (
            tf_col
            + F.lit(K)
            * (
                F.lit(1.0 - B)
                + F.lit(B) * min_dlq / F.lit(float(store.avgdl))
            )
        )

    if plan.qtype == "ngram2":
        from seekstorm_spark.index.builder import NGRAM_SEP

        t1, t2 = plan.ngram_key.split(NGRAM_SEP)
        bound = F.col("boost") * (
            F.lit(float(plan.pos_terms[t1])) * _comp_ub(F.col("max_tf1"))
            + F.lit(float(plan.pos_terms[t2])) * _comp_ub(F.col("max_tf2"))
        )
        rows = rows.withColumn("bound_contrib", bound)
    else:
        rows = rows.withColumn(
            "bound_contrib",
            F.when(F.col("is_not"), F.lit(0.0)).otherwise(
                F.col("idf") * F.col("boost") * _comp_ub(F.col("max_tf"))
            ),
        )
    n_index_fields = len(store.meta.get("fields") or ["text"])
    eff_fields = (
        len(allowed_fields) if allowed_fields is not None else n_index_fields
    )
    base_cols = [
        "term", "field", "boost", "block_id", "idf", "is_not",
        "docids_vb", "tfs_vb", "dls", "pos_vb", "block_bound",
    ]
    if plan.qtype == "ngram2":
        base_cols += ["tfs1_vb", "tfs2_vb"]
    if len(terms) == 1 and eff_fields == 1:
        # single posting row per block: its contribution IS the block
        # bound — skip the per-block window (one whole exchange)
        rows = rows.withColumn("block_bound", F.col("bound_contrib"))
        if facet_cols:
            rows, extra = _join_facet_blocks(spark, store, rows, facet_cols)
            return rows.select(*base_cols, *extra)
        return rows.select(*base_cols)
    w = Window.partitionBy("block_id")
    rows = rows.withColumn("block_bound", F.sum("bound_contrib").over(w))
    if plan.qtype in ("intersection", "phrase"):
        n_required = len(plan.pos_terms)
        rows = rows.withColumn(
            "pos_in_block",
            F.size(
                F.collect_set(
                    F.when(~F.col("is_not"), F.col("term"))
                ).over(w)
            ),
        ).filter(F.col("pos_in_block") >= n_required)
    if facet_cols:
        rows, extra = _join_facet_blocks(spark, store, rows, facet_cols)
        return rows.select(*base_cols, *extra)
    return rows.select(*base_cols)


def _make_kernel(
    plan: QueryPlan,
    top_k: int,
    prune: bool,
    avgdl: float,
    count_only: bool = False,
    block_size: int = ROARING_BLOCK_SIZE,
    deletes: np.ndarray | None = None,
    facet_filters_b: dict[str, np.ndarray] | None = None,
    emit_facets: list[str] | None = None,
    emit_all: bool = False,
):
    is_ngram = plan.qtype == "ngram2"
    if is_ngram:
        from seekstorm_spark.index.builder import NGRAM_SEP

        ngram_parts = tuple(plan.ngram_key.split(NGRAM_SEP))
        # the n-gram posting IS the adjacency match; score it as the
        # intersection of its two partial terms (faithful Bm25f,
        # NGRAM_SEARCH.md)
        qtype = "intersection"
    else:
        ngram_parts = None
        qtype = plan.qtype
    pos_terms = dict(plan.pos_terms)
    not_set = set(plan.not_terms)
    phrase = list(plan.phrase)
    delete_set = deletes if deletes is not None else np.empty(0, dtype=np.int64)
    facet_filters = [
        (f"fb_{name}", allowed)
        for name, allowed in (facet_filters_b or {}).items()
    ]
    emit_cols = [f"fb_{name}" for name in (emit_facets or [])]
    decode_tab = _DECODE_NP.astype(np.float32)
    avgdl32 = np.float32(avgdl)

    def term_scores(idf: float, tfs: np.ndarray, dl_bytes: np.ndarray) -> np.ndarray:
        tf32 = tfs.astype(np.float32)
        dlq = decode_tab[dl_bytes.astype(np.int64)]
        comp = tf32 * np.float32(K + 1.0) / (
            tf32
            + np.float32(K)
            * (np.float32(1.0) - np.float32(B) + np.float32(B) * dlq / avgdl32)
        )
        return np.float32(idf) * comp

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        # per-partition state
        best_docids = np.empty(0, dtype=np.int64)
        best_scores = np.empty(0, dtype=np.float32)
        all_docids: list[np.ndarray] = []
        all_scores: list[np.ndarray] = []
        all_facets: dict[str, list[np.ndarray]] = {c: [] for c in emit_cols}
        total_matches = 0
        pending: list[pd.DataFrame] = []
        pending_block = None

        def threshold() -> float:
            if not prune or len(best_scores) < top_k:
                return -np.inf
            return float(best_scores.min())

        def merge_topk(docids: np.ndarray, scores: np.ndarray) -> None:
            nonlocal best_docids, best_scores
            d = np.concatenate([best_docids, docids])
            s = np.concatenate([best_scores, scores])
            order = np.lexsort((d, -s.astype(np.float64)))[:top_k]
            best_docids, best_scores = d[order], s[order]

        def process_block(rows: pd.DataFrame) -> None:
            nonlocal total_matches
            block_id = int(rows["block_id"].iloc[0])
            if not count_only and prune:
                # skip only on STRICT bound < threshold, with a small
                # relative margin: the bound is computed in float64 while
                # scores accumulate in f32, which can round up past the
                # bound by a few ulps; equal-bound blocks must be
                # processed so the docid-asc tiebreak on exact-tie scores
                # matches the unpruned path.
                thr = threshold()
                eps = 1e-6 + 1e-5 * abs(thr) if np.isfinite(thr) else 0.0
                if float(rows["block_bound"].iloc[0]) < thr - eps:
                    return
            base = block_id * block_size
            # entries in row order = (term asc, field asc): this is the
            # f32 score accumulation order (and the oracle SQL's)
            entries: list[tuple] = []
            groups: dict[str, list[tuple]] = {}
            for _, r in rows.iterrows():
                d = decode_docids(r["docids_vb"])
                dl = np.frombuffer(r["dls"], dtype=np.uint8)
                if is_ngram:
                    # expand the n-gram posting into two pseudo-entries
                    # carrying each partial term's full per-doc tf
                    for tname, tfcol in zip(
                        ngram_parts, ("tfs1_vb", "tfs2_vb")
                    ):
                        e = (
                            tname,
                            int(r["field"]),
                            float(r["boost"]),
                            d,
                            decode_tfs(r[tfcol]),
                            dl,
                            None,
                        )
                        entries.append(e)
                        groups.setdefault(tname, []).append(e)
                    continue
                t = decode_tfs(r["tfs_vb"])
                e = (r["term"], int(r["field"]), float(r["boost"]), d, t, dl, r["pos_vb"])
                entries.append(e)
                groups.setdefault(r["term"], []).append(e)
            if is_ngram:
                # generic scoring accumulates in (term asc, field asc)
                # order — restore it after the pairwise expansion
                entries.sort(key=lambda e: (e[0], e[1]))

            def union_docs(term: str) -> np.ndarray:
                ds = [e[3] for e in groups[term]]
                if len(ds) == 1:
                    return ds[0]
                return np.unique(np.concatenate(ds))

            pos_names = [t for t in groups if t in pos_terms]
            if not pos_names:
                return

            if qtype in ("intersection", "phrase"):
                if len(pos_names) < len(pos_terms):
                    return
                common = union_docs(pos_names[0])
                for t in pos_names[1:]:
                    common = np.intersect1d(
                        common, union_docs(t), assume_unique=True
                    )
                    if common.size == 0:
                        return
                cand = common
            else:
                cand = np.unique(
                    np.concatenate([union_docs(t) for t in pos_names])
                )

            # NOT anti-probe (match in ANY field excludes)
            for t in not_set:
                if t in groups:
                    cand = cand[
                        ~np.isin(cand, union_docs(t), assume_unique=True)
                    ]
            if cand.size == 0:
                return

            # deleted-doc filter (reference add_result.rs:3000-3002)
            if delete_set.size:
                cand = cand[~np.isin(base + cand, delete_set, assume_unique=True)]
                if cand.size == 0:
                    return

            # facet filters via the block's facet byte array (reference
            # pushes facet predicates into the pruned scan the same
            # way, search.rs:2543-2726); filtering candidates keeps the
            # block bound admissible (bound ≥ any subset's max score)
            for colname, allowed in facet_filters:
                buf = rows[colname].iloc[0]
                if buf is None:
                    return
                fv = np.frombuffer(buf, dtype=np.uint8)
                cand = cand[np.isin(fv[cand], allowed)]
                if cand.size == 0:
                    return

            # phrase position alignment (within a single field)
            if qtype == "phrase" and len(phrase) > 1:
                keep = _phrase_filter(groups, cand, phrase)
                cand = cand[keep]
                if cand.size == 0:
                    return

            total_matches += int(cand.size)
            if count_only:
                return

            scores = np.zeros(cand.size, dtype=np.float32)
            for term, _field, boost, d, tf, dl, _pv in entries:
                if term not in pos_terms:
                    continue
                idx = np.searchsorted(d, cand)
                valid = (idx < d.size) & (d[np.minimum(idx, d.size - 1)] == cand)
                ii = idx[valid]
                contrib = np.float32(boost) * term_scores(
                    pos_terms[term], tf[ii], dl[ii]
                )
                scores[valid] += contrib
            if emit_all:
                all_docids.append(base + cand)
                all_scores.append(scores)
                for colname in emit_cols:
                    fv = np.frombuffer(rows[colname].iloc[0], dtype=np.uint8)
                    all_facets[colname].append(fv[cand].astype(np.int32))
            else:
                merge_topk(base + cand, scores)

        for pdf in batches:
            if pdf.empty:
                continue
            for block_id, grp in pdf.groupby("block_id", sort=False):
                if pending_block is not None and block_id != pending_block:
                    process_block(pd.concat(pending))
                    pending = []
                pending_block = block_id
                pending.append(grp)
        if pending:
            process_block(pd.concat(pending))

        if count_only:
            yield pd.DataFrame({"matches": pd.Series([total_matches], dtype="int64")})
        elif emit_all:
            out = {
                "docid": pd.Series(
                    np.concatenate(all_docids)
                    if all_docids
                    else np.empty(0, np.int64),
                    dtype="int64",
                ),
                "score": pd.Series(
                    np.concatenate(all_scores)
                    if all_scores
                    else np.empty(0, np.float32),
                    dtype="float32",
                ),
            }
            for colname in emit_cols:
                out[colname] = pd.Series(
                    np.concatenate(all_facets[colname])
                    if all_facets[colname]
                    else np.empty(0, np.int32),
                    dtype="int32",
                )
            yield pd.DataFrame(out)
        else:
            yield pd.DataFrame(
                {
                    "docid": pd.Series(best_docids, dtype="int64"),
                    "score": pd.Series(best_scores, dtype="float32"),
                }
            )

    return kernel


def _phrase_filter(
    groups: dict[str, list[tuple]],
    cand: np.ndarray,
    phrase: list[tuple[str, int]],
) -> np.ndarray:
    """Boolean mask over cand: doc has the phrase terms position-aligned
    (pos_i - offset_i equal across terms for some shared anchor,
    reference add_result.rs:3152-3391) — within a single field.

    Fully vectorized: each term's (doc, field, position) triples become
    packed ``((doc << 4) | field) << 18 | (pos - offset)`` anchor keys;
    the phrase's anchors are the running ``isin`` intersection across
    terms — no per-doc loop. Positions are < 2^17 (65,536 cap +
    offsets), docids block-local, field ids < 16.
    """
    SHIFT = np.int64(18)
    FSHIFT = np.int64(4)
    # pos - offset can reach -(MAX_QUERY_TERM_NUMBER-1) = -99; the bias
    # keeps keys non-negative so the doc bits stay intact (pos < 65,536,
    # so biased values stay below 2^18)
    BIAS = np.int64(128)

    def term_keys(term: str, off: int) -> np.ndarray | None:
        if term not in groups:
            return None
        parts = []
        for _t, field, _b, d, tf, _dl, pos_vb in groups[term]:
            plists = decode_positions(pos_vb, tf)
            if not len(plists):
                continue
            docs_rep = np.repeat(d, tf)
            pos_flat = np.concatenate(plists)
            parts.append(
                (
                    (
                        (docs_rep.astype(np.int64) << FSHIFT)
                        | np.int64(field)
                    )
                    << SHIFT
                )
                | (pos_flat.astype(np.int64) - np.int64(off) + BIAS)
            )
        if not parts:
            return np.empty(0, dtype=np.int64)
        return np.concatenate(parts)

    anchors: np.ndarray | None = None
    for term, off in phrase:
        keys = term_keys(term, off)
        if keys is None:
            return np.zeros(cand.size, dtype=bool)
        if anchors is None:
            anchors = keys
        else:
            anchors = anchors[np.isin(anchors, keys)]
        if anchors.size == 0:
            return np.zeros(cand.size, dtype=bool)
    matched_docs = np.unique(anchors >> (SHIFT + FSHIFT))
    return np.isin(cand, matched_docs, assume_unique=True)
