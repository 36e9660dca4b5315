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

from seekstorm_spark.codecs import ROARING_BLOCK_SIZE
from seekstorm_spark.index.store import IndexStore
from seekstorm_spark.quantization import decode_lengths

# One shuffled row per (doc, field, term) PAIR — not per token
# position (guide §2.3 "aggregate before you shuffle" / §8 "move
# heavy bytes once"): positions are delta+varint-encoded map-side into
# ``pos_vb`` (byte-identical chunks of the final posting stream —
# varints are per-value independent), and the five small int columns
# ride two packed longs, since an UnsafeRow charges a fixed 8-byte
# slot per field. At 250k synthetic docs this cut the build shuffle
# from 66.8M rows × 8 slots to 40M rows × 4 slots.
#   meta  = field << 40 | dl_byte << 32 | tf        (tf ≤ 65,536)
#   grams = tf1 << 42 | tf2 << 21 | tf3             (each ≤ 65,536)
TERM_ROW_SCHEMA = (
    "docid long, term string, meta long, grams long, pos_vb binary"
)


# Segment-row shuffle (the bulk-load fast path): when the BUILDER
# assigned the docids (``id_col=None``), every map task covers a
# contiguous, disjoint, ascending docid range, so the map side can
# aggregate its (doc, term) pairs all the way down to ONE row per
# (term, field, block, map-batch) — the segment's posting bytes
# already in final encoded form. The reduce concatenates segments in
# docid order, re-encoding ONLY each boundary docid varint (a
# segment's first docid is encoded absolute; in the joined stream it
# must be the delta-1 from the previous segment's last docid — varints
# are per-value independent, so the spliced stream is byte-identical
# to encoding the whole run at once). This cuts the build shuffle from
# ~40M pair rows to ~1M segment rows at the 250k-doc bench corpus;
# the dominant cost was not bytes but per-row shuffle serialization +
# the Arrow→pandas object materialization in the reduce.
TERM_SEG_SCHEMA = (
    "term string, field int, block_id int, seg_first long, "
    "seg_last long, n_pairs int, max_tf int, min_dl_byte int, "
    "max_tf1 int, max_tf2 int, max_tf3 int, docids_vb binary, "
    "tfs_vb binary, dls binary, positions_vb binary, "
    "tfs1_vb binary, tfs2_vb binary, tfs3_vb binary"
)


def term_row_field(col):
    """int32 field id from a packed term-row ``meta``."""
    return F.shiftright(col, 40).cast("int")


def term_row_dl_byte(col):
    """int32 dl_byte from a packed term-row ``meta``."""
    return (F.shiftright(col, 32) % 256).cast("int")

# Multi-field postings: one row per (term, field, block) with the
# field's tf/positions/dl bytes — the reference's default data model
# (per-field tf/positions per doc, index.rs:5332-5407,
# add_result.rs:1171-1426). df_block is the per-block count of
# DISTINCT docs containing the term in ANY field (so term_stats df is
# the BM25F document frequency, not a per-field sum).
POSTING_SCHEMA = (
    "term string, field int, block_id int, posting_count int, "
    "df_block int, max_tf int, min_dl_byte int, docids_vb binary, "
    "tfs_vb binary, dls binary, positions_vb binary, "
    "tfs1_vb binary, tfs2_vb binary, tfs3_vb binary, "
    "max_tf1 int, max_tf2 int, max_tf3 int"
)

# format v3: blocks store (max_tf, min_dl_byte) instead of a baked
# max-score component. BM25's tf saturation is increasing in tf and
# decreasing in dl, so comp(max_tf, min_dl) bounds every doc in the
# block for ANY avgdl — the bound is computed at query time from the
# CURRENT corpus avgdl (the reference equivalently stores the argmax
# doc and rescores it at query time, compress_postinglist.rs:530-676).
# This keeps block-max WAND admissible for incrementally grown indexes
# where avgdl drifts after blocks are written, and removes the avgdl
# dependency from the build (enabling the single-pass build below).
#
# format v4: trigram n-gram postings (tfs3_vb/max_tf3 partial-tf
# columns, reference NgramSet patterns index.rs:1834-1872), typed facet
# metadata ({"type": "string"|"numeric"}), and a LOG-STRUCTURED
# term_stats table: incremental appends add per-batch partial
# aggregates as new files, readers sum df per term across partials.
# v5 adds per-block vmin/vmax zone bounds on numeric facet rows
# (block skipping for range/geo filters); readers tolerate their
# absence, so v4 tables stay readable — the bump just retires caches.
INDEX_FORMAT_VERSION = 5

# hard ceiling on string-facet dictionary cardinality: the sorted
# dictionary is driver-resident (embedded in meta.json, broadcast into
# the encode kernel), so it must stay bounded — enforced executor-side
# before any collect. Higher-cardinality attributes belong in numeric
# or hashed facets.
FACET_DICT_CAP = 1 << 20

# reference NgramSet (index.rs:1834-1852): which adjacent-term shapes
# get pre-joined postings; f = frequent (in frequent_terms), r = rare.
# Default mirrors the reference's DEFAULT_NGRAM_INDEXING (FF | FFF,
# index.rs:1423).
ALL_NGRAM_PATTERNS = ("ff", "fr", "rf", "fff", "rff", "ffr", "frf")
DEFAULT_NGRAM_PATTERNS = ("ff", "fff")


def synonym_map_from_groups(groups: list[dict]) -> dict[str, list[str]]:
    """Synonym groups → source-term expansion map (reference Synonym
    struct, index.rs:1077-1098). Multi-way: every term is indexed
    under all others; one-way: followers are indexed under the FIRST
    term only."""
    out: dict[str, list[str]] = {}
    for group in groups:
        terms_g = list(group["terms"])
        multiway = bool(group.get("multiway", True))
        for i, t in enumerate(terms_g):
            if multiway:
                targets = [x for x in terms_g if x != t]
            elif i > 0:
                targets = [terms_g[0]]
            else:
                targets = []
            if targets:
                out.setdefault(t, []).extend(targets)
    return out


def assign_docids(
    docs: DataFrame,
    order_col: str | None,
    n_buckets: int = 64,
    id_col: str | None = None,
) -> DataFrame:
    """Add a contiguous ``docid`` column without a global sort barrier.

    Three strategies, all cluster-scalable:
    * ``id_col`` — trust an existing unique 0-based long id.
    * ``order_col`` — deterministic independent of input partitioning:
      hash-partition on the key (deterministic across jobs, unlike
      range partitioning whose boundaries are re-sampled per
      execution), SPARK-side sort within each partition (the spilling
      sort — bounded per-task memory, unlike the former per-bucket
      pandas sort that materialized N/n_buckets rows in one task),
      then partition-offset numbering (tiny count collect + broadcast
      prefix sums). Deterministic for unique keys.
    * neither — partition-offset assignment: count rows per input
      partition (map-side, near-zero shuffle), broadcast prefix sums,
      number rows in place. NO data shuffle — the bulk-load fast path;
      deterministic for a fixed input layout.
    """
    if id_col is not None:
        return docs.withColumn("docid", F.col(id_col).cast("long"))

    if order_col is not None:
        docs = docs.repartition(
            n_buckets, F.col(order_col)
        ).sortWithinPartitions(order_col)

    with_pid = docs.withColumn("_pid", F.spark_partition_id())
    counts = {
        int(r["_pid"]): int(r["cnt"])
        for r in with_pid.groupBy("_pid")
        .agg(F.count("*").alias("cnt"))
        .collect()
    }
    max_pid = max(counts) if counts else 0
    offs: list[int] = []
    acc = 0
    for pid in range(max_pid + 1):
        offs.append(acc)
        acc += counts.get(pid, 0)

    # pure-JVM numbering (no Python pass — the former mapInPandas
    # assignment pushed the whole corpus across the JVM↔Python
    # boundary a second time before tokenize):
    # monotonically_increasing_id() is (partition id << 33) | row
    # index within partition, so offset[pid] + (mid - (pid << 33))
    # reproduces the exact sequential numbering batch iteration gave.
    from seekstorm_spark.sqlexpr import long_array

    local = F.monotonically_increasing_id() - F.shiftleft(
        F.col("_pid").cast("long"), 33
    )
    base = F.element_at(long_array(offs), F.col("_pid") + 1)
    return with_pid.withColumn(
        "docid", (base + local).cast("long")
    ).drop("_pid")


NGRAM_SEP = "\x1e"  # joins partial terms inside an n-gram key


def _binary_column(pa, buf, offsets, validity=None):
    """Arrow binary array from a contiguous (buffer, offsets) pair —
    zero-copy, no per-row Python bytes objects. ``validity`` (bool
    array) marks non-null rows; null rows must be zero-width."""
    n = len(offsets) - 1
    vbuf = (
        None
        if validity is None
        else pa.py_buffer(np.packbits(validity, bitorder="little"))
    )
    return pa.Array.from_buffers(
        pa.binary(),
        n,
        [vbuf, pa.py_buffer(offsets.astype(np.int32)), pa.py_buffer(buf)],
    )


def _sentinel_segment_batch(pa, docs_a, dlb_a, fid, block_size):
    """Segment rows for the term='' sentinels: one pair per doc with
    tf=1 and a single position 0, so tf-1 and the position delta both
    encode to one zero byte per pair — built directly, no sort or
    varint pass needed (docids arrive ascending)."""
    from seekstorm_spark.codecs import vb_encode_chunk_offsets

    d = docs_a
    blk = d // np.int64(block_size)
    n = len(d)
    new_run = np.empty(n, dtype=bool)
    new_run[0] = True
    new_run[1:] = blk[1:] != blk[:-1]
    starts = np.flatnonzero(new_run)
    ends = np.append(starts[1:], n)
    lens = ends - starts
    n_runs = len(starts)
    local = d - blk * np.int64(block_size)
    dd = np.empty_like(local)
    dd[0] = local[0]
    dd[1:] = local[1:] - local[:-1] - 1
    dd[starts] = local[starts]
    dbuf, doff = vb_encode_chunk_offsets(dd, lens)
    one_byte_off = np.append(starts, n).astype(np.int64)
    zeros_buf = b"\x00" * n
    gram_null = _binary_column(
        pa,
        b"",
        np.zeros(n_runs + 1, dtype=np.int64),
        validity=np.zeros(n_runs, dtype=bool),
    )
    return pa.RecordBatch.from_arrays(
        [
            pa.array([""] * n_runs, type=pa.string()),
            pa.array(np.full(n_runs, fid, dtype=np.int32), type=pa.int32()),
            pa.array(blk[starts].astype(np.int32), type=pa.int32()),
            pa.array(d[starts], type=pa.int64()),
            pa.array(d[ends - 1], type=pa.int64()),
            pa.array(lens.astype(np.int32), type=pa.int32()),
            pa.array(np.ones(n_runs, dtype=np.int32), type=pa.int32()),
            pa.array(
                np.minimum.reduceat(dlb_a, starts).astype(np.int32),
                type=pa.int32(),
            ),
            pa.array(np.zeros(n_runs, dtype=np.int32), type=pa.int32()),
            pa.array(np.zeros(n_runs, dtype=np.int32), type=pa.int32()),
            pa.array(np.zeros(n_runs, dtype=np.int32), type=pa.int32()),
            _binary_column(pa, dbuf, doff),
            _binary_column(pa, zeros_buf, one_byte_off),
            _binary_column(
                pa, dlb_a.astype(np.uint8).tobytes(), one_byte_off
            ),
            _binary_column(pa, zeros_buf, one_byte_off),
            gram_null,
            gram_null,
            gram_null,
        ],
        names=[
            "term", "field", "block_id", "seg_first", "seg_last",
            "n_pairs", "max_tf", "min_dl_byte", "max_tf1", "max_tf2",
            "max_tf3", "docids_vb", "tfs_vb", "dls", "positions_vb",
            "tfs1_vb", "tfs2_vb", "tfs3_vb",
        ],
    )


def _segment_record_batch(
    pa,
    d,
    t,
    uniq,
    tf_s,
    dlb_s,
    g1s,
    g2s,
    g3s,
    pos_buf,
    pos_off,
    fid,
    block_size,
):
    """(doc, term)-ordered pair arrays → one segment row per
    (term, block) run, posting bytes in final encoded form. ``t`` are
    codes into ``uniq``; ``pos_off`` slices ``pos_buf`` per pair in
    the incoming order.

    The per-run byte streams are exactly the slices the v1 reduce
    kernel would produce for these pairs: docid deltas reset at run
    starts (absolute first value), tf-1 varints per pair, raw dl
    bytes, per-pair position chunks, and gram tf varints on n-gram
    runs only.
    """
    from seekstorm_spark.codecs import vb_encode_chunk_offsets

    # re-sort the PAIRS term-major (6x fewer elements than sorting
    # the occurrences term-major — see the _pairs note)
    order = np.lexsort((d, t))
    d = d[order]
    t = t[order]
    tf_s = tf_s[order]
    dlb_s = dlb_s[order]
    g1s, g2s, g3s = g1s[order], g2s[order], g3s[order]
    plens = np.diff(pos_off)[order]
    old_starts = pos_off[:-1][order]
    total_pos = int(plens.sum())
    new_starts = np.concatenate(([0], np.cumsum(plens)[:-1]))
    gather = np.repeat(old_starts - new_starts, plens) + np.arange(
        total_pos, dtype=np.int64
    )
    pos_buf = np.frombuffer(pos_buf, dtype=np.uint8)[gather]
    pos_off = np.concatenate(([0], np.cumsum(plens)))

    blk = d // np.int64(block_size)
    n = len(d)
    new_run = np.empty(n, dtype=bool)
    new_run[0] = True
    new_run[1:] = (t[1:] != t[:-1]) | (blk[1:] != blk[:-1])
    if n > 1 and not bool(np.all(new_run[1:] | (d[1:] > d[:-1]))):
        raise ValueError(
            "emit='segments' requires ascending docids per task "
            "(builder-assigned ids); use the pair shuffle for id_col "
            "batches"
        )
    starts = np.flatnonzero(new_run)
    ends = np.append(starts[1:], n)
    lens = ends - starts
    n_runs = len(starts)

    local = d - blk * np.int64(block_size)
    dd = np.empty_like(local)
    dd[0] = local[0]
    dd[1:] = local[1:] - local[:-1] - 1
    dd[starts] = local[starts]
    dbuf, doff = vb_encode_chunk_offsets(dd, lens)
    tbuf, toff = vb_encode_chunk_offsets(tf_s - 1, lens)

    dls_u8 = dlb_s.astype(np.uint8)
    # one raw byte per pair: run offsets are the pair indices
    dls_off = np.append(starts, n).astype(np.int64)

    # positions: the per-pair chunks are already in run order
    pos_u8 = pos_buf
    pos_run_off = pos_off[np.append(starts, n)]

    run_t = t[starts]
    seps = np.array([u.count(NGRAM_SEP) for u in uniq], dtype=np.int64)
    run_seps = seps[run_t]
    gram_run = run_seps > 0
    tri_run = run_seps == 2
    gram_pairs = np.repeat(gram_run, lens)
    tri_pairs = np.repeat(tri_run, lens)

    def _gram_col(vals, pair_mask, run_mask):
        buf, part_off = vb_encode_chunk_offsets(
            vals[pair_mask] - 1, lens[run_mask]
        )
        out_off = np.zeros(n_runs + 1, dtype=np.int64)
        out_off[1:][run_mask] = np.diff(part_off)
        np.cumsum(out_off, out=out_off)
        return _binary_column(pa, buf, out_off, validity=run_mask)

    tfs1_arr = _gram_col(g1s, gram_pairs, gram_run)
    tfs2_arr = _gram_col(g2s, gram_pairs, gram_run)
    tfs3_arr = _gram_col(g3s, tri_pairs, tri_run)

    max_tf = np.maximum.reduceat(tf_s, starts).astype(np.int32)
    min_dlb = np.minimum.reduceat(dlb_s, starts).astype(np.int32)
    mt1 = np.where(gram_run, np.maximum.reduceat(g1s, starts), 0)
    mt2 = np.where(gram_run, np.maximum.reduceat(g2s, starts), 0)
    mt3 = np.where(tri_run, np.maximum.reduceat(g3s, starts), 0)

    return pa.RecordBatch.from_arrays(
        [
            pa.array(uniq[run_t], type=pa.string()),
            pa.array(
                np.full(n_runs, fid, dtype=np.int32), type=pa.int32()
            ),
            pa.array(blk[starts].astype(np.int32), type=pa.int32()),
            pa.array(d[starts], type=pa.int64()),
            pa.array(d[ends - 1], type=pa.int64()),
            pa.array(lens.astype(np.int32), type=pa.int32()),
            pa.array(max_tf, type=pa.int32()),
            pa.array(min_dlb, type=pa.int32()),
            pa.array(mt1.astype(np.int32), type=pa.int32()),
            pa.array(mt2.astype(np.int32), type=pa.int32()),
            pa.array(mt3.astype(np.int32), type=pa.int32()),
            _binary_column(pa, dbuf, doff),
            _binary_column(pa, tbuf, toff),
            _binary_column(pa, dls_u8.tobytes(), dls_off),
            _binary_column(pa, pos_u8, pos_run_off),
            tfs1_arr,
            tfs2_arr,
            tfs3_arr,
        ],
        names=[
            "term", "field", "block_id", "seg_first", "seg_last",
            "n_pairs", "max_tf", "min_dl_byte", "max_tf1", "max_tf2",
            "max_tf3", "docids_vb", "tfs_vb", "dls", "positions_vb",
            "tfs1_vb", "tfs2_vb", "tfs3_vb",
        ],
    )


def tokenize_to_term_rows(
    docs: DataFrame,
    text_col: str = "text",
    tokenizer: str = "unicode_alphanumeric",
    stop_words: frozenset[str] | None = None,
    fields: list[str] | None = None,
    stemmer: str | None = None,
    frequent_terms: frozenset[str] | None = None,
    synonym_map: dict[str, list[str]] | None = None,
    ngram_patterns: tuple[str, ...] | list[str] | None = None,
    emit: str = "pairs",
    block_size: int = ROARING_BLOCK_SIZE,
) -> DataFrame:
    """docs(docid, <fields…>) → flat (docid, field, term, pos, dl_byte)
    rows; one sentinel row per (doc, field) (term='', pos=-1) carries
    that field's quantized length so empty fields stay counted.

    ``emit="segments"`` (bulk-load fast path, REQUIRES per-task
    ascending docids — the builder-assigned id paths) aggregates all
    the way to TERM_SEG_SCHEMA rows map-side; see the schema comment.
    ``block_size`` is only used by segment emission.

    ``fields`` defaults to ``[text_col]`` (single-field, field id 0);
    multi-field indexes list their field columns in build order — the
    list index IS the field id (reference indexed_field_id_vec,
    index.rs:5332-5407).

    Flat position-level rows keep the Python side to one regex call
    per field plus numpy array assembly — the per-(term,doc)
    aggregation happens vectorized inside the posting-block kernel,
    not here. Position semantics match ``tokenizer.tokenize_doc``
    (stopwords dropped without advancing positions; 65,536-token field
    cap, reference tokenizer.rs:584-894).
    """
    tokenizer_name = tokenizer
    # stop_words: one global set, or per-field sets {field_col: set}
    # (reference per-index stopword lists, index.rs:1238-1256; a field
    # without an entry keeps every token)
    stops = stop_words
    stem_lang = stemmer
    freq = frequent_terms
    syn = synonym_map
    patterns = tuple(
        ngram_patterns
        if ngram_patterns is not None
        else (DEFAULT_NGRAM_PATTERNS if freq else ())
    )
    bi_patterns = frozenset(p for p in patterns if len(p) == 2)
    tri_patterns = frozenset(p for p in patterns if len(p) == 3)
    field_cols = list(fields) if fields else [text_col]
    if emit not in ("pairs", "segments"):
        raise ValueError(f"unknown emit mode {emit!r}")
    emit_segments = emit == "segments"

    def _tok(batches):
        # mapInArrow, not mapInPandas: the output is hundreds of
        # thousands of pair rows per batch, and building them as a
        # pandas DataFrame costs ~17x more than building the Arrow
        # arrays directly (measured — pandas object-column
        # consolidation, all thrown away at the Arrow boundary anyway)
        import pyarrow as pa

        from seekstorm_spark.codecs import vb_encode_chunk_offsets
        from seekstorm_spark.quantization import int_to_byte4
        from seekstorm_spark.tokenizer import TOKEN_PER_FIELD_MAX, tokenize_line

        def _pairs(doc_idx, codes, positions, term_major=False):
            """Aggregate occurrence-level (doc index, term code, pos)
            triples into (doc, term) pairs: returns (index of each
            pair's first-by-position occurrence, tf per pair, and the
            per-pair VB position-delta chunks as one contiguous
            ``(buffer, offsets)`` pair). Occurrences are sorted
            by (pair key, pos) — the same position interleave the
            former position-level kernel produced — so the VB chunk
            per pair is byte-identical to the corresponding slice of
            the final posting stream (varint values are encoded
            independently and deltas reset at every pair change).

            ``term_major`` orders pairs by (term, doc) instead of
            (doc, term) — per-pair chunks are unchanged (deltas reset
            at every pair either way). NOTE: measured SLOWER for
            segment emission despite saving the second sort — the
            doc-major key is nearly sorted (occurrences arrive in doc
            order, stable mergesort exploits the runs) while the
            term-major key is a full shuffle of the occurrence array,
            and re-sorting the ~6x smaller PAIR array afterwards is
            cheaper. Kept for the record."""
            if term_major:
                key = codes.astype(np.int64) * np.int64(
                    int(doc_idx.max()) + 1 if len(doc_idx) else 1
                ) + doc_idx
            else:
                key = doc_idx.astype(np.int64) * np.int64(
                    int(codes.max()) + 1 if len(codes) else 1
                ) + codes
            order = np.lexsort((positions, key))
            sk = key[order]
            first = np.empty(len(sk), dtype=bool)
            if len(sk):
                first[0] = True
                first[1:] = sk[1:] != sk[:-1]
            starts = np.flatnonzero(first)
            tf = np.diff(np.append(starts, len(sk)))
            p_sorted = positions[order]
            deltas = np.empty_like(p_sorted)
            if len(p_sorted):
                deltas[0] = p_sorted[0]
                deltas[1:] = p_sorted[1:] - p_sorted[:-1] - 1
                deltas[starts] = p_sorted[starts]
            return order[starts], tf, vb_encode_chunk_offsets(deltas, tf)

        for rb in batches:
            docid_in = rb.column(rb.schema.get_field_index("docid")).to_numpy(
                zero_copy_only=False
            )
            text_in = {
                fcol: rb.column(rb.schema.get_field_index(fcol)).to_pylist()
                for fcol in field_cols
            }
            for fid, fcol in enumerate(field_cols):
                stops_f = (
                    stops.get(fcol) if isinstance(stops, dict) else stops
                )
                doc_ids: list[int] = []
                counts: list[int] = []
                dl_bytes: list[int] = []
                all_terms: list[str] = []
                ng_doc: list[int] = []
                ng_term: list[str] = []
                ng_pos: list[int] = []
                ng_dlb: list[int] = []
                ng_tf1: list[int] = []
                ng_tf2: list[int] = []
                ng_tf3: list[int] = []
                sy_doc: list[int] = []
                sy_term: list[str] = []
                sy_pos: list[int] = []
                sy_dlb: list[int] = []
                for docid, text in zip(docid_in, text_in[fcol]):
                    toks = tokenize_line(
                        text if isinstance(text, str) else "",
                        tokenizer_name,
                        stem_lang,
                    )
                    if stops_f:
                        toks = [t for t in toks if t not in stops_f]
                    if len(toks) > TOKEN_PER_FIELD_MAX:
                        toks = toks[:TOKEN_PER_FIELD_MAX]
                    doc_ids.append(int(docid))
                    counts.append(len(toks))
                    dlb = int_to_byte4(len(toks))
                    dl_bytes.append(dlb)
                    all_terms.extend(toks)
                    if syn:
                        # index-time synonym expansion: a doc
                        # containing a source term is ALSO indexed
                        # under its synonym targets at the same
                        # positions (reference index.rs:5869-5897;
                        # Synonym struct index.rs:1077-1098) — doc
                        # length stays unchanged
                        for i, tok in enumerate(toks):
                            for target in syn.get(tok, ()):
                                sy_doc.append(int(docid))
                                sy_term.append(target)
                                sy_pos.append(i)
                                sy_dlb.append(dlb)
                counts_a = np.asarray(counts, dtype=np.int64)
                docs_a = np.asarray(doc_ids, dtype=np.int64)
                dlb_a = np.asarray(dl_bytes, dtype=np.int32)
                total = int(counts_a.sum())
                starts = np.concatenate(([0], np.cumsum(counts_a)[:-1]))
                pos = np.arange(total, dtype=np.int64) - np.repeat(
                    starts, counts_a
                )
                didx = np.repeat(
                    np.arange(len(docs_a), dtype=np.int64), counts_a
                )
                terms_arr = np.asarray(all_terms, dtype=object)
                tcodes = pd.factorize(terms_arr)[0].astype(np.int64)
                if freq and (bi_patterns or tri_patterns) and total:
                    # N-gram postings: adjacent term pairs/triples
                    # whose frequent/rare shape matches an enabled
                    # pattern become extra posting terms carrying the
                    # FULL per-doc tf of each partial term, so BM25
                    # scoring stays rank-identical (NGRAM_SEARCH.md
                    # "faithful N-gram Bm25f"; tokenizer.rs:673-1387,
                    # index.rs:1834-1872). Vectorized over the whole
                    # batch: frequent-term membership, per-(doc, term)
                    # tf, and pattern selection are array ops; Python
                    # touches only the selected gram positions (the
                    # per-doc Counter+loop version cost ~2x the
                    # tokenize itself).
                    isf = pd.Series(terms_arr).isin(freq).to_numpy()
                    doc_rep = np.repeat(docs_a, counts_a)
                    dlb_rep = np.repeat(
                        dlb_a.astype(np.int64), counts_a
                    )
                    # per-(doc, term) tf broadcast back to positions
                    key = didx * (int(tcodes.max()) + 1) + tcodes
                    _uk, inv, cnt = np.unique(
                        key, return_inverse=True, return_counts=True
                    )
                    tf_pos = cnt[inv]
                    same = doc_rep[1:] == doc_rep[:-1]
                    code2 = (
                        isf[:-1].astype(np.int8) * 2
                        + isf[1:].astype(np.int8)
                    )
                    allow2 = np.array(
                        [p in bi_patterns for p in ("rr", "rf", "fr", "ff")]
                    )
                    sel2 = np.flatnonzero(same & allow2[code2])
                    if len(terms_arr) >= 3 and tri_patterns:
                        same3 = same[:-1] & same[1:]
                        code3 = (
                            isf[:-2].astype(np.int8) * 4
                            + isf[1:-1].astype(np.int8) * 2
                            + isf[2:].astype(np.int8)
                        )
                        allow3 = np.array(
                            [
                                p in tri_patterns
                                for p in (
                                    "rrr", "rrf", "rfr", "rff",
                                    "frr", "frf", "ffr", "fff",
                                )
                            ]
                        )
                        sel3 = np.flatnonzero(same3 & allow3[code3])
                    else:
                        sel3 = np.empty(0, np.int64)
                    ng_term = [
                        a + NGRAM_SEP + b
                        for a, b in zip(
                            terms_arr[sel2], terms_arr[sel2 + 1]
                        )
                    ] + [
                        a + NGRAM_SEP + b + NGRAM_SEP + c
                        for a, b, c in zip(
                            terms_arr[sel3],
                            terms_arr[sel3 + 1],
                            terms_arr[sel3 + 2],
                        )
                    ]
                    ng_doc = np.concatenate(
                        [doc_rep[sel2], doc_rep[sel3]]
                    )
                    ng_pos = np.concatenate([pos[sel2], pos[sel3]])
                    ng_dlb = np.concatenate(
                        [dlb_rep[sel2], dlb_rep[sel3]]
                    )
                    ng_tf1 = np.concatenate(
                        [tf_pos[sel2], tf_pos[sel3]]
                    )
                    ng_tf2 = np.concatenate(
                        [tf_pos[sel2 + 1], tf_pos[sel3 + 1]]
                    )
                    ng_tf3 = np.concatenate(
                        [
                            np.zeros(len(sel2), np.int64),
                            tf_pos[sel3 + 2],
                        ]
                    )
                # ---- occurrence → pair aggregation (map-side) ----
                # ONE aggregation over regular + n-gram + synonym
                # occurrences: a synonym target colliding with a
                # regular token of the same doc must merge into ONE
                # pair with position-interleaved deltas, exactly as
                # the former position-level shuffle + kernel run-
                # length produced. Gram payload (tf1-3) is taken from
                # the pair's first-by-position occurrence — the old
                # kernel's pair_starts semantics.
                fid_hi = np.int64(fid) << np.int64(40)
                n_ng, n_sy = len(ng_doc), len(sy_doc)
                occ_doc = np.concatenate([
                    np.repeat(docs_a, counts_a),
                    np.asarray(ng_doc, dtype=np.int64),
                    np.asarray(sy_doc, dtype=np.int64),
                ])
                occ_term = np.concatenate([
                    terms_arr,
                    np.asarray(ng_term, dtype=object),
                    np.asarray(sy_term, dtype=object),
                ])
                occ_pos = np.concatenate([
                    pos,
                    np.asarray(ng_pos, dtype=np.int64),
                    np.asarray(sy_pos, dtype=np.int64),
                ])
                occ_dlb = np.concatenate([
                    np.repeat(dlb_a.astype(np.int64), counts_a),
                    np.asarray(ng_dlb, dtype=np.int64),
                    np.asarray(sy_dlb, dtype=np.int64),
                ])
                zeros_reg = np.zeros(total, np.int64)
                zeros_sy = np.zeros(n_sy, np.int64)
                occ_g1 = np.concatenate(
                    [zeros_reg, np.asarray(ng_tf1, np.int64), zeros_sy]
                )
                occ_g2 = np.concatenate(
                    [zeros_reg, np.asarray(ng_tf2, np.int64), zeros_sy]
                )
                occ_g3 = np.concatenate(
                    [zeros_reg, np.asarray(ng_tf3, np.int64), zeros_sy]
                )
                # sentinel pairs: term='', tf=1, one position 0
                # (the clipped pos=-1 of the former sentinel rows) —
                # byte-identical posting stream for the '' term.
                # pos_vb assembles ZERO-COPY as (buffer, offsets):
                # materializing one Python bytes object per pair just
                # to re-pack them into an Arrow binary array was the
                # single hottest line of the whole tokenize pass.
                n_sent = len(docs_a)
                if emit_segments:
                    if n_sent == 0:
                        continue
                    if n_sent > 1 and not bool(
                        np.all(docs_a[1:] > docs_a[:-1])
                    ):
                        raise ValueError(
                            "emit='segments' requires ascending docids "
                            "per task (builder-assigned ids); use the "
                            "pair shuffle for id_col batches"
                        )
                    yield _sentinel_segment_batch(
                        pa, docs_a, dlb_a, fid, block_size
                    )
                    if len(occ_doc):
                        dcodes = pd.factorize(occ_doc)[0].astype(
                            np.int64
                        )
                        ocodes, ouniq = pd.factorize(occ_term)
                        ocodes = ocodes.astype(np.int64)
                        sel, ptf, (pbuf, poff) = _pairs(
                            dcodes, ocodes, occ_pos
                        )
                        yield _segment_record_batch(
                            pa,
                            occ_doc[sel],
                            ocodes[sel],
                            np.asarray(ouniq, dtype=object),
                            ptf,
                            occ_dlb[sel],
                            occ_g1[sel],
                            occ_g2[sel],
                            occ_g3[sel],
                            pbuf,
                            poff,
                            fid,
                            block_size,
                        )
                    continue
                if len(occ_doc):
                    dcodes = pd.factorize(occ_doc)[0].astype(np.int64)
                    ocodes = pd.factorize(occ_term)[0].astype(np.int64)
                    sel, ptf, (pbuf, poff) = _pairs(
                        dcodes, ocodes, occ_pos
                    )
                else:
                    sel = np.empty(0, dtype=np.int64)
                    ptf = np.empty(0, dtype=np.int64)
                    pbuf, poff = b"", np.zeros(1, dtype=np.int64)
                out_docid = [docs_a, occ_doc[sel]]
                out_terms: list = [""] * n_sent
                out_terms.extend(occ_term[sel].tolist())
                out_meta = [
                    fid_hi
                    | (dlb_a.astype(np.int64) << np.int64(32))
                    | np.int64(1),
                    fid_hi | (occ_dlb[sel] << np.int64(32)) | ptf,
                ]
                out_grams = [
                    np.zeros(n_sent, np.int64),
                    (occ_g1[sel] << np.int64(42))
                    | (occ_g2[sel] << np.int64(21))
                    | occ_g3[sel],
                ]
                n_rows = n_sent + (len(poff) - 1)
                # sentinel chunks are 1 byte each (b"\x00"), then the
                # pair chunks shifted past them
                offsets32 = np.empty(n_rows + 1, dtype=np.int32)
                offsets32[: n_sent + 1] = np.arange(
                    n_sent + 1, dtype=np.int32
                )
                offsets32[n_sent:] = (poff + n_sent).astype(np.int32)
                data = b"\x00" * n_sent + pbuf
                posvb_arr = pa.Array.from_buffers(
                    pa.binary(),
                    n_rows,
                    [None, pa.py_buffer(offsets32), pa.py_buffer(data)],
                )
                yield pa.RecordBatch.from_arrays(
                    [
                        pa.array(
                            np.concatenate(out_docid), type=pa.int64()
                        ),
                        pa.array(out_terms, type=pa.string()),
                        pa.array(
                            np.concatenate(out_meta), type=pa.int64()
                        ),
                        pa.array(
                            np.concatenate(out_grams), type=pa.int64()
                        ),
                        posvb_arr,
                    ],
                    names=["docid", "term", "meta", "grams", "pos_vb"],
                )

    return docs.select("docid", *field_cols).mapInArrow(
        _tok,
        schema=TERM_SEG_SCHEMA if emit_segments else TERM_ROW_SCHEMA,
    )


def tokenize_to_doc_lengths(
    docs: DataFrame,
    text_col: str = "text",
    tokenizer: str = "unicode_alphanumeric",
    stop_words: frozenset[str] | None = None,
) -> DataFrame:
    """docs(docid, text) → (docid, dl_byte): token counts only, no term
    materialization or shuffle — the cheap first pass that yields
    N/avgdl before the posting pass needs them."""
    tokenizer_name = tokenizer
    stops = stop_words

    def _count(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from seekstorm_spark.quantization import int_to_byte4
        from seekstorm_spark.tokenizer import TOKEN_PER_FIELD_MAX, tokenize_line

        for pdf in batches:
            dl = []
            for text in pdf[text_col].values:
                toks = tokenize_line(text or "", tokenizer_name)
                if stops:
                    toks = [t for t in toks if t not in stops]
                dl.append(int_to_byte4(min(len(toks), TOKEN_PER_FIELD_MAX)))
            yield pd.DataFrame(
                {
                    "docid": pdf["docid"].values,
                    "dl_byte": pd.Series(dl, dtype="int32"),
                }
            )

    return docs.select("docid", text_col).mapInPandas(
        _count, schema="docid long, dl_byte int"
    )


def build_posting_blocks(
    term_rows: DataFrame,
    n_buckets: int,
    only_buckets: list[int] | None = None,
    block_size: int = ROARING_BLOCK_SIZE,
) -> DataFrame:
    """(term-bucket, block) groups → compressed posting rows.

    Grouping by (tbucket, block_id) — not (term, block_id) — gives a
    small number of *large* Arrow batches, each vectorized with one
    ``lexsort`` + run-length pass over all its terms, instead of
    millions of tiny per-term UDF invocations. Group size stays
    bounded: ≤65,536 docids/block (`index.rs:114-115`) × the bucket's
    share of the vocabulary — the Spark analog of the reference's 2048
    term-hash segments committed per block (`index.rs:988-995`,
    `commit.rs:467-682`). Raise ``n_buckets`` to shrink groups at
    scale; skew from hot terms is already capped by the block bound.

    Sentinel rows (term='', one per doc, carrying the doc's dl byte)
    flow through the same shuffle and become the term-'' posting rows
    from which doc_meta is derived — the document-length table rides
    the one tokenize pass instead of needing its own.
    """

    def _build(key: tuple, pdf: pd.DataFrame) -> pd.DataFrame:
        # applyInPandas for the IO (an A/B on this box measured
        # PySpark 4.1's applyInArrow JVM path ~2.3x slower even with a
        # trivial UDF — the "unstable, for developers" grouped-Arrow
        # runner), but every per-posting value below is computed with
        # reduceat / chunked-VB array ops; the only Python loops slice
        # bytes.
        from seekstorm_spark.codecs import vb_encode_chunks

        tbucket, block_id = int(key[0]), int(key[1])
        term_codes, uniq_terms = pd.factorize(pdf["term"], sort=True)
        term_codes = term_codes.astype(np.int64)
        uniq_terms = np.asarray(uniq_terms, dtype=object)
        # input rows ARE (doc, field, term) pairs: unpack the two
        # packed longs (see TERM_ROW_SCHEMA) — positions arrive as
        # per-pair VB byte chunks the map side already encoded
        meta = pdf["meta"].values.astype(np.int64)
        fld = meta >> np.int64(40)
        dlb_all = ((meta >> np.int64(32)) & np.int64(0xFF)).astype(
            np.uint8
        )
        tf_all = meta & np.int64(0xFFFFFFFF)
        d = pdf["docid"].values.astype(np.int64)
        g = pdf["grams"].values.astype(np.int64)
        posvb = pdf["pos_vb"].values
        order = np.lexsort((d, fld, term_codes))
        td_term = term_codes[order]
        td_field = fld[order]
        td_doc = d[order]
        td_dlb = dlb_all[order]
        tfs_all = tf_all[order]
        g = g[order]
        td_tf1 = g >> np.int64(42)
        td_tf2 = (g >> np.int64(21)) & np.int64(0x1FFFFF)
        td_tf3 = g & np.int64(0x1FFFFF)
        posvb = posvb[order]
        n_pairs = len(td_term)

        # per-(term, field) runs over the pair-level arrays — one
        # output posting row per run
        new_tf = np.empty(n_pairs, dtype=bool)
        new_tf[0] = True
        new_tf[1:] = (td_term[1:] != td_term[:-1]) | (
            td_field[1:] != td_field[:-1]
        )
        tf_starts = np.flatnonzero(new_tf)
        tf_ends = np.append(tf_starts[1:], n_pairs)
        run_lens = tf_ends - tf_starts
        n_runs = len(tf_starts)
        run_term = td_term[tf_starts]

        # per-term distinct-doc count (union df_block across fields),
        # vectorized: unique (term, doc) keys, then run-length per term
        new_term = np.empty(n_pairs, dtype=bool)
        new_term[0] = True
        new_term[1:] = td_term[1:] != td_term[:-1]
        term_starts = np.flatnonzero(new_term)
        # block-local docids fit 16 bits, so (term_code << 17) | local
        # never collides at any corpus scale
        local_for_key = td_doc - np.int64(block_id) * np.int64(block_size)
        td_key = td_term * np.int64(1 << 17) + local_for_key
        uk = np.unique(td_key)
        uk_term, uk_counts = np.unique(
            uk >> np.int64(17), return_counts=True
        )
        df_by_code = np.zeros(len(uniq_terms), dtype=np.int64)
        df_by_code[uk_term] = uk_counts
        # df_block only on the term's FIRST field run, so summing over
        # rows never double counts (0 on the others)
        run_is_first = np.isin(tf_starts, term_starts, assume_unique=True)
        out_dfb = np.where(run_is_first, df_by_code[run_term], 0)

        # docids: pair-level deltas resetting at run starts → one VB
        # encode sliced per run
        local_all = (td_doc - block_id * block_size).astype(np.int64)
        dd = np.empty_like(local_all)
        dd[0] = local_all[0]
        dd[1:] = local_all[1:] - local_all[:-1] - 1
        dd[tf_starts] = local_all[tf_starts]
        out_docids = vb_encode_chunks(dd, run_lens)

        # tfs: VB of tf-1 per pair, sliced per run
        out_tfs = vb_encode_chunks(tfs_all - 1, run_lens)

        # positions: concatenate the map-side per-pair VB chunks per
        # run — byte-identical to encoding the run's delta stream in
        # one go (varints are per-value independent, deltas reset at
        # every pair start)
        out_pos = [
            b"".join(posvb[s:e]) for s, e in zip(tf_starts, tf_ends)
        ]

        # dl bytes: raw u8 per pair, sliced per run
        dls_all = td_dlb.tobytes()
        dls_view = memoryview(dls_all)
        out_dls = [
            bytes(dls_view[s:e]) for s, e in zip(tf_starts, tf_ends)
        ]

        out_maxtf = np.maximum.reduceat(tfs_all, tf_starts).astype(np.int32)
        out_mindl = np.minimum.reduceat(td_dlb, tf_starts).astype(np.int32)

        # n-gram runs carry the partial terms' full per-doc tfs
        # (reference NGRAM_SEARCH.md); non-gram runs get NULL columns
        n_seps = np.array(
            [s.count(NGRAM_SEP) for s in uniq_terms], dtype=np.int64
        )
        run_seps = n_seps[run_term]
        gram_run = run_seps > 0
        tri_run = run_seps == 2
        gram_pairs = np.repeat(gram_run, run_lens)
        tri_pairs = np.repeat(tri_run, run_lens)
        gsel = np.flatnonzero(gram_run)
        tsel = np.flatnonzero(tri_run)
        out_tfs1: list = [None] * n_runs
        out_tfs2: list = [None] * n_runs
        out_tfs3: list = [None] * n_runs
        for idx, b1, b2 in zip(
            gsel,
            vb_encode_chunks(td_tf1[gram_pairs] - 1, run_lens[gsel]),
            vb_encode_chunks(td_tf2[gram_pairs] - 1, run_lens[gsel]),
        ):
            out_tfs1[idx] = b1
            out_tfs2[idx] = b2
        for idx, b3 in zip(
            tsel, vb_encode_chunks(td_tf3[tri_pairs] - 1, run_lens[tsel])
        ):
            out_tfs3[idx] = b3
        mt1 = np.maximum.reduceat(td_tf1, tf_starts)
        mt2 = np.maximum.reduceat(td_tf2, tf_starts)
        mt3 = np.maximum.reduceat(td_tf3, tf_starts)
        out_maxtf1 = np.where(gram_run, mt1, 0).astype(np.int32)
        out_maxtf2 = np.where(gram_run, mt2, 0).astype(np.int32)
        out_maxtf3 = np.where(tri_run, mt3, 0).astype(np.int32)

        return pd.DataFrame(
            {
                "term": uniq_terms[run_term],
                "field": pd.Series(
                    td_field[tf_starts].astype(np.int32), dtype="int32"
                ),
                "block_id": pd.Series(
                    np.full(n_runs, block_id, dtype=np.int32),
                    dtype="int32",
                ),
                "posting_count": pd.Series(
                    run_lens.astype(np.int32), dtype="int32"
                ),
                "df_block": pd.Series(
                    out_dfb.astype(np.int32), dtype="int32"
                ),
                "max_tf": pd.Series(out_maxtf, dtype="int32"),
                "min_dl_byte": pd.Series(out_mindl, dtype="int32"),
                "docids_vb": out_docids,
                "tfs_vb": out_tfs,
                "dls": out_dls,
                "positions_vb": out_pos,
                "tfs1_vb": out_tfs1,
                "tfs2_vb": out_tfs2,
                "tfs3_vb": out_tfs3,
                "max_tf1": pd.Series(out_maxtf1, dtype="int32"),
                "max_tf2": pd.Series(out_maxtf2, dtype="int32"),
                "max_tf3": pd.Series(out_maxtf3, dtype="int32"),
                "tbucket": pd.Series(
                    np.full(n_runs, tbucket, dtype=np.int32),
                    dtype="int32",
                ),
            }
        )

    def _build_seg(key: tuple, pdf: pd.DataFrame) -> pd.DataFrame:
        """Segment-row reduce (TERM_SEG_SCHEMA input): concatenate the
        map-encoded posting byte streams per (term, field) in docid
        order, re-encoding only each segment-boundary docid varint —
        byte-identical to :func:`_build` over the same pairs (varints
        are per-value independent; the boundary value is the delta-1
        the whole-run encode would have produced)."""
        from seekstorm_spark.codecs import (
            vb_byte_lengths,
            vb_decode,
            vb_encode_chunk_offsets,
        )

        tbucket, block_id = int(key[0]), int(key[1])
        term_codes, uniq_terms = pd.factorize(pdf["term"], sort=True)
        term_codes = term_codes.astype(np.int64)
        uniq_terms = np.asarray(uniq_terms, dtype=object)
        fld = pdf["field"].values.astype(np.int64)
        first = pdf["seg_first"].values.astype(np.int64)
        last = pdf["seg_last"].values.astype(np.int64)
        order = np.lexsort((first, fld, term_codes))
        t = term_codes[order]
        f = fld[order]
        first = first[order]
        last = last[order]
        n_pairs = pdf["n_pairs"].values.astype(np.int64)[order]
        s_mtf = pdf["max_tf"].values.astype(np.int64)[order]
        s_mdl = pdf["min_dl_byte"].values.astype(np.int64)[order]
        s_mt1 = pdf["max_tf1"].values.astype(np.int64)[order]
        s_mt2 = pdf["max_tf2"].values.astype(np.int64)[order]
        s_mt3 = pdf["max_tf3"].values.astype(np.int64)[order]
        dvb = pdf["docids_vb"].values[order]
        tvb = pdf["tfs_vb"].values[order]
        dls = pdf["dls"].values[order]
        pvb = pdf["positions_vb"].values[order]
        t1 = pdf["tfs1_vb"].values[order]
        t2 = pdf["tfs2_vb"].values[order]
        t3 = pdf["tfs3_vb"].values[order]
        n_seg = len(t)

        new_run = np.empty(n_seg, dtype=bool)
        new_run[0] = True
        new_run[1:] = (t[1:] != t[:-1]) | (f[1:] != f[:-1])
        starts = np.flatnonzero(new_run)
        ends = np.append(starts[1:], n_seg)
        n_runs = len(starts)
        run_term = t[starts]

        # segments of one run must be disjoint ascending docid ranges
        # (the emit='segments' contract — builder-assigned ids)
        if n_seg > 1 and not bool(
            np.all(new_run[1:] | (first[1:] > last[:-1]))
        ):
            raise ValueError(
                "overlapping docid segments — emit='segments' used "
                "with non-ascending per-task docids"
            )

        base = np.int64(block_id) * np.int64(block_size)
        local_first = first - base
        local_last = last - base
        # boundary docid varint for every non-run-start segment: the
        # delta-1 from the previous segment's last docid
        bvals = np.where(
            new_run,
            0,
            local_first - np.concatenate(([0], local_last[:-1])) - 1,
        ).astype(np.uint64)
        bbuf, boff = vb_encode_chunk_offsets(
            bvals, np.ones(n_seg, dtype=np.int64)
        )
        head_lens = vb_byte_lengths(local_first.astype(np.uint64))

        out_docids: list = []
        out_tfs: list = []
        out_dls: list = []
        out_pos: list = []
        out_tfs1: list = []
        out_tfs2: list = []
        out_tfs3: list = []
        for s, e in zip(starts, ends):
            if e - s == 1:
                out_docids.append(dvb[s])
            else:
                parts = [dvb[s]]
                for i in range(s + 1, e):
                    parts.append(
                        bytes(bbuf[boff[i] : boff[i + 1]])
                        + dvb[i][int(head_lens[i]) :]
                    )
                out_docids.append(b"".join(parts))
            out_tfs.append(b"".join(tvb[s:e]))
            out_dls.append(b"".join(dls[s:e]))
            out_pos.append(b"".join(pvb[s:e]))
            if t1[s] is not None:
                out_tfs1.append(b"".join(t1[s:e]))
                out_tfs2.append(b"".join(t2[s:e]))
            else:
                out_tfs1.append(None)
                out_tfs2.append(None)
            out_tfs3.append(
                b"".join(t3[s:e]) if t3[s] is not None else None
            )

        out_count = np.add.reduceat(n_pairs, starts)
        out_maxtf = np.maximum.reduceat(s_mtf, starts).astype(np.int32)
        out_mindl = np.minimum.reduceat(s_mdl, starts).astype(np.int32)
        out_maxtf1 = np.maximum.reduceat(s_mt1, starts).astype(np.int32)
        out_maxtf2 = np.maximum.reduceat(s_mt2, starts).astype(np.int32)
        out_maxtf3 = np.maximum.reduceat(s_mt3, starts).astype(np.int32)

        # df_block: distinct docs per term ACROSS fields, placed on
        # the term's first run. Single-field terms (the common case):
        # segments are disjoint, every pair a distinct doc, so df =
        # posting_count. Terms spanning >1 field decode their docid
        # streams and count the union (same value the pair kernel's
        # unique-(term, doc) pass produced).
        new_term = np.empty(n_runs, dtype=bool)
        new_term[0] = True
        new_term[1:] = run_term[1:] != run_term[:-1]
        tstarts = np.flatnonzero(new_term)
        tends = np.append(tstarts[1:], n_runs)
        out_dfb = np.zeros(n_runs, dtype=np.int64)
        for ts, te in zip(tstarts, tends):
            if te - ts == 1:
                out_dfb[ts] = out_count[ts]
            else:
                seen: list = []
                for run in range(ts, te):
                    v = vb_decode(out_docids[run])
                    seen.append(
                        np.cumsum(v.astype(np.int64) + 1) - 1
                    )
                out_dfb[ts] = len(np.unique(np.concatenate(seen)))

        return pd.DataFrame(
            {
                "term": uniq_terms[run_term],
                "field": pd.Series(
                    f[starts].astype(np.int32), dtype="int32"
                ),
                "block_id": pd.Series(
                    np.full(n_runs, block_id, dtype=np.int32),
                    dtype="int32",
                ),
                "posting_count": pd.Series(
                    out_count.astype(np.int32), dtype="int32"
                ),
                "df_block": pd.Series(
                    out_dfb.astype(np.int32), dtype="int32"
                ),
                "max_tf": pd.Series(out_maxtf, dtype="int32"),
                "min_dl_byte": pd.Series(out_mindl, dtype="int32"),
                "docids_vb": out_docids,
                "tfs_vb": out_tfs,
                "dls": out_dls,
                "positions_vb": out_pos,
                "tfs1_vb": out_tfs1,
                "tfs2_vb": out_tfs2,
                "tfs3_vb": out_tfs3,
                "max_tf1": out_maxtf1,
                "max_tf2": out_maxtf2,
                "max_tf3": out_maxtf3,
                "tbucket": pd.Series(
                    np.full(n_runs, tbucket, dtype=np.int32),
                    dtype="int32",
                ),
            }
        )

    is_segments = "seg_first" in term_rows.columns
    blocks = term_rows
    if not is_segments:
        blocks = blocks.withColumn(
            "block_id", (F.col("docid") / F.lit(block_size)).cast("int")
        )
    blocks = blocks.withColumn(
        "tbucket",
        F.pmod(F.xxhash64(F.col("term")), F.lit(n_buckets)).cast("int"),
    )
    if only_buckets is not None:
        # resume: skip committed buckets before the shuffle, not after
        blocks = blocks.filter(
            F.col("tbucket").isin([int(b) for b in only_buckets])
        )
    return blocks.groupBy("tbucket", "block_id").applyInPandas(
        _build_seg if is_segments else _build,
        schema=POSTING_SCHEMA + ", tbucket int",
    )


FACET_MISSING = 255  # u8 string-facet code for null/unknown


def facet_values(spec) -> list[str] | None:
    """Dictionary values of a facet spec (None for numeric facets).
    Accepts both the v4 typed shape ({"type", "values"}) and the
    legacy v3 plain-list shape."""
    if isinstance(spec, dict):
        return spec.get("values")
    return list(spec)


def facet_kind(spec) -> str:
    """"string" | "string_set" | "numeric" for a facet spec."""
    if isinstance(spec, dict):
        return spec.get("type", "string")
    return "string"


def facet_code_dtype(n_values: int):
    """Dictionary-code dtype by cardinality — u8 (≤255 values,
    missing=255), u16 (String16, reference facet cardinality 2^16,
    ARCHITECTURE.md), u32 (String32, 2^32). The missing sentinel is
    the dtype's max value, reserved from the dictionary."""
    if n_values <= 255:
        return np.uint8
    if n_values <= 65_535:
        return np.uint16
    return np.uint32


def facet_missing_code(n_values: int) -> int:
    return int(np.iinfo(facet_code_dtype(n_values)).max)


def encode_string_set_block(lists: list, mapping: dict, size: int) -> bytes:
    """Pack a block's multi-value facet (reference StringSet) as CSR:
    ``[u32 size][u32 offsets (size+1)][codes dtype-by-cardinality]``.
    A doc with no entry (or missing slot) simply has an empty span."""
    dtype = facet_code_dtype(len(mapping))
    counts = np.zeros(size, dtype=np.uint32)
    codes_per_doc: list[list[int]] = [[] for _ in range(size)]
    for local, values in lists:
        if values is None:
            continue
        cs = sorted(
            {mapping[str(v)] for v in values if str(v) in mapping}
        )
        codes_per_doc[local] = cs
        counts[local] = len(cs)
    offsets = np.zeros(size + 1, dtype=np.uint32)
    np.cumsum(counts, out=offsets[1:])
    flat = np.fromiter(
        (c for cs in codes_per_doc for c in cs),
        dtype=dtype,
        count=int(offsets[-1]),
    )
    return (
        np.uint32(size).tobytes() + offsets.tobytes() + flat.tobytes()
    )


def decode_string_set_block(buf: bytes, n_values: int):
    """→ (offsets u32[size+1], codes). Inverse of
    :func:`encode_string_set_block`."""
    size = int(np.frombuffer(buf, dtype=np.uint32, count=1)[0])
    offsets = np.frombuffer(buf, dtype=np.uint32, count=size + 1, offset=4)
    codes = np.frombuffer(
        buf, dtype=facet_code_dtype(n_values), offset=4 + 4 * (size + 1)
    )
    return offsets, codes


def build_facet_dictionaries(
    docs_with_ids: DataFrame,
    facet_cols: list[str],
    facet_types: dict[str, str] | None = None,
) -> dict[str, dict]:
    """Typed facet metadata in ONE Spark job regardless of facet count.

    String facets get a sorted ≤255-value dictionary (one byte per doc
    per block; byte order == value order so engine-side sorts on the
    byte are value-correct; 255 = missing). Numeric facets store raw
    float64 values per block (range filters/counts at query time, the
    reference's numeric RangeType facets, search.rs:3598-3764) and
    need no dictionary. A numeric ARRAY column is a Point facet
    ([lat, lon] per doc — the reference's Point facet type,
    search.rs:2712-2724): one interleaved f64 buffer per block instead
    of two separate numeric facets.
    """
    numeric_types = {
        "tinyint", "smallint", "int", "bigint", "float", "double", "decimal",
    }
    meta: dict[str, dict] = {}
    string_cols = []
    set_cols = []
    for fc in facet_cols:
        dtype = dict(docs_with_ids.dtypes)[fc]
        base = dtype.split("(")[0]
        if base in numeric_types:
            meta[fc] = {"type": "numeric"}
        elif dtype.startswith("array<"):
            inner = dtype[len("array<"):-1].split("(")[0]
            if inner in numeric_types:
                # geo Point facet: [lat, lon] pairs. facet_types can
                # opt the column into the PACKED form ("morton"): one
                # u64 Morton code per doc — half the buffer bytes of
                # the interleaved f64 pair, at i32×10^7 coordinate
                # quantization (the reference stores Point facets
                # exactly so, geo_search.rs:33)
                declared = (facet_types or {}).get(fc)
                if declared not in (None, "point", "morton"):
                    raise ValueError(
                        f"facet {fc!r}: array<numeric> supports types "
                        f"'point'/'morton', got {declared!r}"
                    )
                meta[fc] = {"type": declared or "point"}
            else:
                # multi-value facet (reference StringSet, search.rs:2543+)
                meta[fc] = {"type": "string_set"}
                set_cols.append(fc)
        else:
            meta[fc] = {"type": "string"}
            string_cols.append(fc)
    if string_cols or set_cols:
        # one unioned distinct pass for ALL dictionaries (single job)
        parts = []
        if string_cols:
            parts.append(
                docs_with_ids.select(
                    F.explode(
                        F.array(
                            *[
                                F.struct(
                                    F.lit(fc).alias("facet"),
                                    F.col(fc).cast("string").alias("value"),
                                )
                                for fc in string_cols
                            ]
                        )
                    ).alias("kv")
                ).select("kv.facet", "kv.value")
            )
        for fc in set_cols:
            parts.append(
                docs_with_ids.select(
                    F.lit(fc).alias("facet"),
                    F.explode(F.col(fc)).alias("value"),
                ).select("facet", F.col("value").cast("string").alias("value"))
            )
        kv = parts[0]
        for p in parts[1:]:
            kv = kv.unionByName(p)
        distinct = kv.filter(F.col("value").isNotNull()).distinct()
        distinct.persist()
        try:
            # cardinality gate runs EXECUTOR-side before any value
            # reaches the driver: the dictionary is driver-resident
            # (broadcast into the encode kernel, embedded in meta), so
            # an unbounded facet must fail before the collect, not
            # after it OOMs the driver. The reference's String32
            # ceiling is 2^32; a >cap dictionary belongs in a
            # numeric/hashed facet instead.
            counts = {
                r["facet"]: r["n"]
                for r in distinct.groupBy("facet")
                .agg(F.count("*").alias("n"))
                .collect()
            }
            for fc, n in counts.items():
                if n > FACET_DICT_CAP:
                    raise ValueError(
                        f"facet {fc!r} has {n} distinct values "
                        f"(cap {FACET_DICT_CAP}); use a numeric facet "
                        "for unbounded cardinality"
                    )
            rows = distinct.collect()
        finally:
            distinct.unpersist()
        by_facet: dict[str, list[str]] = {
            fc: [] for fc in string_cols + set_cols
        }
        for r in rows:
            by_facet[r["facet"]].append(r["value"])
        for fc, vals in by_facet.items():
            meta[fc]["values"] = sorted(vals)
    return meta


def encode_facet_blocks(
    docs_with_ids: DataFrame,
    facet_meta: dict[str, dict],
    block_size: int = ROARING_BLOCK_SIZE,
) -> DataFrame:
    """Per-block facet arrays for ALL facets in ONE kernel pass — the
    distributed analog of the reference's in-RAM per-doc facet array
    (index.rs facet_index). One row per (facet, block): string facets
    are uint8 dictionary codes, numeric facets raw float64 (NaN =
    missing). Numeric rows also carry the block's value min/max —
    block-level zone bounds that let range/geo queries skip whole
    blocks before decoding (the reference skips via its per-segment
    facet stats); NaN bounds mean "no value in this block"."""
    facet_cols = list(facet_meta)
    mappings = {
        fc: {v: i for i, v in enumerate(facet_values(spec) or [])}
        for fc, spec in facet_meta.items()
    }
    kinds = {fc: facet_kind(spec) for fc, spec in facet_meta.items()}

    def _enc(key: tuple, pdf: pd.DataFrame) -> pd.DataFrame:
        block_id = int(key[0])
        local = pdf["docid"].values.astype(np.int64) - block_id * block_size
        size = int(local.max()) + 1
        out_facet, out_vals = [], []
        out_vmin: list[float] = []
        out_vmax: list[float] = []
        for fc in facet_cols:
            kind = kinds[fc]
            vmin = vmax = np.nan
            if kind == "numeric":
                arr = np.full(size, np.nan, dtype=np.float64)
                vals = pd.to_numeric(pdf[fc], errors="coerce").values.astype(
                    np.float64
                )
                arr[local] = vals
                if not np.isnan(vals).all():
                    vmin = float(np.nanmin(vals))
                    vmax = float(np.nanmax(vals))
                buf = arr.tobytes()
            elif kind in ("point", "morton"):
                # zone bounds carry the LATITUDE min/max (longitude
                # wraps, so lat is the safe block-skipping dimension)
                lats = np.full(len(pdf), np.nan)
                lons = np.full(len(pdf), np.nan)
                for j, v in enumerate(pdf[fc].values):
                    if v is not None and len(v) == 2:
                        lats[j] = float(v[0])
                        lons[j] = float(v[1])
                if kind == "point":
                    # interleaved [lat0, lon0, lat1, lon1, …] f64 pairs
                    arr = np.full(2 * size, np.nan, dtype=np.float64)
                    arr[2 * local] = lats
                    arr[2 * local + 1] = lons
                    if not np.isnan(lats).all():
                        vmin = float(np.nanmin(lats))
                        vmax = float(np.nanmax(lats))
                else:
                    # PACKED form: one u64 Morton code per doc (half
                    # the bytes of the pair buffer); 0 = missing (code
                    # 0 decodes to lat −214.7° — outside the valid
                    # range, so no real point collides). Zone bounds
                    # use the QUANTIZED latitude (what the kernel
                    # decodes), keeping the block skip lossless.
                    from seekstorm_spark.functions.geo import (
                        morton_decode,
                        morton_encode,
                    )

                    arr = np.zeros(size, dtype=np.uint64)
                    has = ~np.isnan(lats) & ~np.isnan(lons)
                    if has.any():
                        codes = morton_encode(lats[has], lons[has])
                        arr[local[has]] = codes
                        qlat, _qlon = morton_decode(codes)
                        vmin = float(qlat.min())
                        vmax = float(qlat.max())
                buf = arr.tobytes()
            elif kind == "string_set":
                buf = encode_string_set_block(
                    list(zip(local.tolist(), pdf[fc].values)),
                    mappings[fc],
                    size,
                )
            else:
                mapping = mappings[fc]
                missing = facet_missing_code(len(mapping))
                dtype = facet_code_dtype(len(mapping))
                arr = np.full(size, missing, dtype=dtype)
                codes = (
                    pdf[fc]
                    .map(
                        lambda v: missing
                        if v is None
                        else mapping.get(str(v), missing)
                    )
                    .values.astype(dtype)
                )
                arr[local] = codes
                # v5 zone bounds for STRING facets: min/max CODE over
                # non-missing docs. Dictionary byte order == value
                # order (frozen-dictionary invariant), so code order
                # IS value order and top-k-by-string sorts can skip
                # blocks exactly like numeric keys.
                nm = codes[codes != missing]
                if nm.size:
                    vmin = float(nm.min())
                    vmax = float(nm.max())
                buf = arr.tobytes()
            out_facet.append(fc)
            out_vals.append(buf)
            out_vmin.append(vmin)
            out_vmax.append(vmax)
        return pd.DataFrame(
            {
                "facet": out_facet,
                "block_id": pd.Series(
                    np.full(len(out_facet), block_id), dtype="int32"
                ),
                "fvalues": out_vals,
                "vmin": pd.Series(out_vmin, dtype="float64"),
                "vmax": pd.Series(out_vmax, dtype="float64"),
            }
        )

    return (
        docs_with_ids.select("docid", *facet_cols)
        .withColumn(
            "block_id", (F.col("docid") / F.lit(block_size)).cast("int")
        )
        .groupBy("block_id")
        .applyInPandas(
            _enc,
            schema="facet string, block_id int, fvalues binary, "
            "vmin double, vmax double",
        )
    )


def build_facet_blocks(
    docs_with_ids: DataFrame,
    facet_cols: list[str],
    block_size: int = ROARING_BLOCK_SIZE,
    facet_types: dict[str, str] | None = None,
) -> tuple[DataFrame, dict[str, dict]]:
    """Dictionaries (one job) + per-block arrays (one kernel) — build
    job count is independent of the number of facets."""
    facet_meta = build_facet_dictionaries(
        docs_with_ids, facet_cols, facet_types
    )
    return encode_facet_blocks(docs_with_ids, facet_meta, block_size), facet_meta


def _decode_doc_meta(
    sentinel_postings: DataFrame, block_size: int
) -> DataFrame:
    """term-'' posting rows → (docid, dl_byte) rows.

    Each sentinel posting block holds every docid of that block with
    its SmallFloat dl byte — decoding them reconstructs the doc-length
    table without a second tokenize pass over the corpus.
    """
    from seekstorm_spark.codecs import decode_docids

    def _dec(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            outs_d: list[np.ndarray] = []
            outs_f: list[np.ndarray] = []
            outs_b: list[np.ndarray] = []
            for block_id, field, docids_vb, dls in zip(
                pdf["block_id"].values,
                pdf["field"].values,
                pdf["docids_vb"].values,
                pdf["dls"].values,
            ):
                d = decode_docids(docids_vb) + int(block_id) * block_size
                outs_d.append(d.astype(np.int64))
                outs_f.append(np.full(d.size, int(field), dtype=np.int32))
                outs_b.append(np.frombuffer(dls, dtype=np.uint8).astype(np.int32))
            if not outs_d:
                continue
            yield pd.DataFrame(
                {
                    "docid": np.concatenate(outs_d),
                    "field": np.concatenate(outs_f),
                    "dl_byte": np.concatenate(outs_b),
                }
            )

    return sentinel_postings.mapInPandas(
        _dec, schema="docid long, field int, dl_byte int"
    )


def term_stats_aggregate(postings: DataFrame) -> DataFrame:
    """Postings → per-(tbucket, term) list-head aggregates. Shared by
    the full build (whole table) and incremental appends (one batch's
    staged postings → a log-structured PARTIAL; readers sum df per
    term across partials, so append cost is O(batch) not O(index))."""
    return postings.filter(F.col("term") != "").groupBy(
        "tbucket", "term"
    ).agg(
        # df = distinct docs containing the term in ANY field
        # (df_block is nonzero on one field row per (term, block))
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


class IndexBuilder:
    def __init__(
        self,
        spark: SparkSession,
        index_path: str,
        tokenizer: str = "unicode_alphanumeric",
        stop_words: frozenset[str] | None = None,
        n_buckets: int = 32,
        block_size: int = ROARING_BLOCK_SIZE,
        fields: list[str] | None = None,
        facet_cols: list[str] | None = None,
        facet_types: dict[str, str] | None = None,
        stemmer: str | None = None,
        frequent_terms: list[str] | None = None,
        synonyms: list[dict] | None = None,
        ngram_patterns: list[str] | None = None,
    ):
        self.spark = spark
        self.index_path = index_path
        self.tokenizer = tokenizer
        self.stop_words = stop_words
        self.n_buckets = n_buckets
        self.block_size = block_size
        self.fields = list(fields) if fields else None
        self.facet_cols = list(facet_cols) if facet_cols else None
        self.facet_types = dict(facet_types) if facet_types else None
        self.stemmer = stemmer
        # a language code ("en"/"de"/"fr"/"es") resolves to the
        # built-in stopword-class list — the reference's default
        # frequent_en dictionary semantics
        from seekstorm_spark.dictionaries import frequent_terms_for

        resolved_freq = frequent_terms_for(frequent_terms)
        self.frequent_terms = (
            frozenset(resolved_freq) if resolved_freq else None
        )
        # reference NgramSet subset (index.rs:1834-1872); default
        # FF | FFF when a frequent set is given
        if ngram_patterns is not None:
            bad = set(ngram_patterns) - set(ALL_NGRAM_PATTERNS)
            if bad:
                raise ValueError(
                    f"unknown ngram patterns {sorted(bad)}; "
                    f"valid: {ALL_NGRAM_PATTERNS}"
                )
            self.ngram_patterns = tuple(ngram_patterns)
        else:
            self.ngram_patterns = (
                DEFAULT_NGRAM_PATTERNS if self.frequent_terms else ()
            )
        # synonyms: [{"terms": [...], "multiway": bool}] (reference
        # Synonym struct, index.rs:1077-1098). Multi-way: every term is
        # indexed under all others; one-way: followers are indexed
        # under the FIRST term only (searches for the first term find
        # them, not vice versa).
        self.synonyms = synonyms or []
        self.synonym_map = synonym_map_from_groups(self.synonyms)

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

        from seekstorm_spark.hashing import term_bucket

        sentinel_bucket = term_bucket("", self.n_buckets)

        fields = self.fields or [text_col]
        facet_cols = self.facet_cols or []
        # project early: only (order/id, <fields…>, <facets…>) enter the
        # build shuffles — at 100 TB the html payload must never ride
        keep = [
            c
            for c in dict.fromkeys([order_col, id_col, *fields, *facet_cols])
            if c
        ]
        docs = assign_docids(
            docs.select(*keep), order_col=order_col, id_col=id_col,
            n_buckets=max(self.n_buckets, 16),
        )
        facet_dicts: dict[str, dict] = {}
        if facet_cols:
            facet_blocks, facet_dicts = build_facet_blocks(
                docs.select("docid", *facet_cols),
                facet_cols,
                self.block_size,
                facet_types=self.facet_types,
            )
            (
                facet_blocks.repartition(1, "facet")
                .write.mode("overwrite")
                .partitionBy("facet")
                .parquet(store.facets_path)
            )
        docs = docs.select("docid", *fields)

        # --- resume bookkeeping ---
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

        # --- ONE tokenize pass → posting blocks, bucketed by term hash.
        # Sentinel rows (term='', dl per doc) ride the same shuffle and
        # become the term-'' postings that doc_meta derives from; format
        # v2 bounds need no avgdl at build time, so no stats pre-pass.
        term_rows = tokenize_to_term_rows(
            docs, text_col, self.tokenizer, self.stop_words, fields=fields,
            stemmer=self.stemmer, frequent_terms=self.frequent_terms,
            synonym_map=self.synonym_map or None,
            ngram_patterns=self.ngram_patterns,
            # builder-assigned ids ascend within every task (both the
            # order_col and partition-offset paths), so the bulk load
            # takes the segment shuffle; id_col docids are caller-
            # controlled and keep the pair shuffle
            emit="pairs" if id_col is not None else "segments",
            block_size=self.block_size,
        )
        posting_blocks = build_posting_blocks(
            term_rows,
            self.n_buckets,
            only_buckets=targets if len(targets) < self.n_buckets else None,
            block_size=self.block_size,
        )

        mode = "append" if (resume or only_buckets) and os.path.exists(
            store.postings_path
        ) else "overwrite"
        # exactly one shuffle partition per term bucket: each write task
        # emits one parquet file into one partition dir (a task writing
        # into many dirs costs a non-scaling file-create tail)
        (
            posting_blocks.repartition(self.n_buckets, "tbucket")
            .sortWithinPartitions("term", "block_id")
            .write.mode(mode)
            .partitionBy("tbucket")
            .parquet(store.postings_path)
        )

        postings = store.postings(spark)

        # --- doc_meta + global stats (reference commit.rs:264-325),
        # derived from the sentinel postings (partition-pruned read of
        # one tbucket) once the sentinel bucket has been committed ---
        n_docs, pos_sum, avgdl = 0, 0, 1.0
        if sentinel_bucket in targets or sentinel_bucket in committed:
            if sentinel_bucket in targets or not os.path.exists(
                store.doc_meta_path
            ):
                sent = postings.filter(
                    (F.col("tbucket") == sentinel_bucket) & (F.col("term") == "")
                ).select("block_id", "field", "docids_vb", "dls")
                _decode_doc_meta(sent, self.block_size).write.mode(
                    "overwrite"
                ).parquet(store.doc_meta_path)
            doc_meta = store.doc_meta(spark)
            # one collect: the per-field length histogram yields N
            # (field-0 rows), and the positions sum over ALL fields
            # (avgdl = Σ per-field quantized dl / doc count,
            # commit.rs:318-319, f32 division)
            dl_hist = {
                (int(r["field"]), int(r["dl_byte"])): int(r["cnt"])
                for r in doc_meta.groupBy("field", "dl_byte")
                .agg(F.count("*").alias("cnt"))
                .collect()
            }
            n_docs = int(sum(c for (fid, _b), c in dl_hist.items() if fid == 0))
            pos_sum = int(
                sum(
                    int(decode_lengths(np.array([b]))[0]) * c
                    for (_f, b), c in dl_hist.items()
                )
            )
            avgdl = (
                float(np.float32(pos_sum) / np.float32(n_docs)) if n_docs else 1.0
            )

        # --- term stats (list heads: df, cf, list-max metadata) ---
        term_stats = term_stats_aggregate(postings)
        (
            term_stats.repartition(self.n_buckets, "tbucket")
            .sortWithinPartitions("term")
            .write.mode("overwrite")
            .partitionBy("tbucket")
            .parquet(store.term_stats_path)
        )

        # --- lineage (per-bucket commit record), derived from the tiny
        # term_stats table so the postings payload is read only once ---
        ts = store.term_stats(spark)
        lineage = (
            ts.filter(F.col("tbucket").isin([int(b) for b in targets]))
            .groupBy("tbucket")
            .agg(
                F.sum("n_blocks").cast("long").alias("n_blocks"),
                F.count("*").cast("long").alias("n_terms"),
                F.sum("df").cast("long").alias("n_postings"),
                F.sum("bytes").cast("long").alias("bytes"),
            )
            .withColumn("committed_at", F.current_timestamp())
            .withColumn("build_wall_s", F.lit(float(time.time() - t0)))
        )
        lineage.write.mode(
            "append" if (resume or only_buckets) and os.path.exists(store.lineage_path)
            else "overwrite"
        ).parquet(store.lineage_path)

        from seekstorm_spark.query.engine import invalidate_term_stats_cache

        invalidate_term_stats_cache(store.path)

        store.meta = {
            "version": INDEX_FORMAT_VERSION,
            "fields": fields,
            "facets": facet_dicts,
            "tokenizer": self.tokenizer,
            "stemmer": self.stemmer,
            "frequent_terms": sorted(self.frequent_terms)
            if self.frequent_terms
            else [],
            "ngram_patterns": list(self.ngram_patterns),
            "synonyms": self.synonyms,
            # per-field stopword sets (reference index.rs:1238-1256):
            # the QUERY side drops only terms that are stopwords in
            # EVERY field — a term kept by any field can still match
            **(
                {
                    "stop_words": sorted(
                        set.intersection(
                            *[set(v) for v in self.stop_words.values()]
                        )
                        if len(self.stop_words) == len(fields)
                        else set()
                    ),
                    "stop_words_by_field": {
                        f: sorted(v) for f, v in self.stop_words.items()
                    },
                }
                if isinstance(self.stop_words, dict)
                else {
                    "stop_words": sorted(self.stop_words)
                    if self.stop_words
                    else []
                }
            ),
            "n_docs": n_docs,
            "positions_sum_normalized": pos_sum,
            "avgdl": avgdl,
            "next_docid": n_docs,
            "n_buckets": self.n_buckets,
            "block_size": self.block_size,
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
            m = json.load(f)
        # stale on-disk caches from an older format must rebuild
        if m.get("complete") and m.get("version") == INDEX_FORMAT_VERSION:
            return IndexStore.open(index_path)
    return IndexBuilder(spark, index_path, **(builder_kwargs or {})).build(
        docs, **(build_kwargs or {})
    )


_FACET_DDL_BY_TYPE = {
    "string": "string",
    "string_set": "array<string>",
    "numeric": "double",
    "point": "array<double>",
    "morton": "array<double>",
}


def clear_index(spark: SparkSession, store: IndexStore) -> IndexStore:
    """Reset the index to empty while maintaining the schema
    (reference ``Index::clear_index``, index.rs:4920-4945: postings,
    dictionaries, completions, and doc store are dropped; the index
    settings survive).

    Every data subdirectory is removed, then an empty index is rebuilt
    at the same path from the meta-recorded configuration (tokenizer,
    stemmer, stopwords, frequent terms + n-gram patterns, synonyms,
    fields, facet declarations). Two pieces of non-build state are
    carried across: the facet DICTIONARIES (byte order == value order
    is part of the frozen schema — appends after the clear validate
    against the same value set) and the API-key hash."""
    import shutil

    meta = dict(store.meta)
    path = store.path
    facets_meta = meta.get("facets") or {}

    for entry in sorted(os.listdir(path)):
        full = os.path.join(path, entry)
        if os.path.isdir(full):
            shutil.rmtree(full)

    fields = list(meta.get("fields") or ["text"])
    facet_cols = sorted(facets_meta)
    ddl = ", ".join(
        ["doc_id long"]
        + [f"`{f}` string" for f in fields]
        + [
            f"`{c}` {_FACET_DDL_BY_TYPE[facet_kind(facets_meta[c])]}"
            for c in facet_cols
        ]
    )
    empty = spark.createDataFrame([], ddl)

    by_field = meta.get("stop_words_by_field")
    if by_field:
        stop_words: Any = {f: frozenset(v) for f, v in by_field.items()}
    else:
        stop_words = (
            frozenset(meta["stop_words"]) if meta.get("stop_words") else None
        )
    builder = IndexBuilder(
        spark,
        path,
        tokenizer=meta.get("tokenizer", "unicode_alphanumeric"),
        stop_words=stop_words,
        n_buckets=int(meta.get("n_buckets", 32)),
        block_size=int(meta.get("block_size", ROARING_BLOCK_SIZE)),
        fields=fields if len(fields) > 1 else None,
        facet_cols=facet_cols or None,
        facet_types={
            c: facet_kind(facets_meta[c]) for c in facet_cols
        }
        or None,
        stemmer=meta.get("stemmer"),
        frequent_terms=list(meta.get("frequent_terms") or []) or None,
        synonyms=meta.get("synonyms") or None,
        ngram_patterns=list(meta.get("ngram_patterns") or []),
    )
    kwargs: dict[str, Any] = {"id_col": "doc_id"}
    if len(fields) == 1:
        kwargs["text_col"] = fields[0]
    new_store = builder.build(empty, **kwargs)

    if facets_meta:
        # schema survives the clear: the frozen dictionaries (and
        # declared types) come back verbatim, so post-clear appends
        # accept exactly the same value universe
        new_store.meta["facets"] = facets_meta
    if meta.get("api_key_sha256"):
        new_store.meta["api_key_sha256"] = meta["api_key_sha256"]
    new_store.write_meta()

    from seekstorm_spark.query.engine import invalidate_term_stats_cache

    invalidate_term_stats_cache(path)
    return new_store


def get_synonyms(store: IndexStore) -> list[dict]:
    """Current synonym groups (reference ``Index::get_synonyms``,
    index.rs:4955-4966 — there a SYNONYMS_FILENAME json, here the
    ``synonyms`` key of meta.json)."""
    return list(store.meta.get("synonyms") or [])


def _validate_synonym_groups(groups: list[dict]) -> list[dict]:
    out = []
    for g in groups:
        terms = [str(t) for t in (g.get("terms") or []) if str(t)]
        if len(terms) < 2:
            raise ValueError(
                "each synonym group needs >= 2 non-empty terms"
            )
        out.append({"terms": terms, "multiway": bool(g.get("multiway", True))})
    return out


def set_synonyms(store: IndexStore, groups: list[dict]) -> int:
    """Replace the index's synonyms (reference ``Index::set_synonyms``,
    index.rs:4969-4979). Affects only SUBSEQUENTLY indexed documents —
    the append/realtime path expands against meta['synonyms'] at
    tokenize time, so existing postings are untouched (same contract
    as the reference: "Affects only subsequently indexed documents").
    Returns the group count."""
    store.meta["synonyms"] = _validate_synonym_groups(groups)
    store.write_meta()
    return len(store.meta["synonyms"])


def add_synonyms(store: IndexStore, groups: list[dict]) -> int:
    """Append/merge synonym groups (reference ``Index::add_synonyms``,
    index.rs:4982-5002: read-merge-rewrite). Returns the TOTAL group
    count after the merge, like the reference."""
    merged = list(store.meta.get("synonyms") or [])
    merged.extend(_validate_synonym_groups(groups))
    store.meta["synonyms"] = merged
    store.write_meta()
    return len(merged)
