"""Indexed query execution: block-max WAND over the postings table.

Spark-first re-expression of the reference's read path
(`/root/reference/seekstorm/src/search.rs:1154-2131`). A point query
is exactly ONE Spark job:

* query terms → driver-side pyarrow probe of the partitioned
  term-stats table (the reference's in-RAM segment-dictionary probe,
  `search.rs:3066-3303`) — no Spark pre-job; the table is
  log-structured (appends add per-batch partials), so the probe sums
  df per term; phrases rewrite GREEDILY TRIGRAM-FIRST onto pre-joined
  n-gram postings (`NGRAM_SEARCH.md`; reference `tokenizer.rs:898-1387`,
  `index.rs:1833-1872`) — remaining cross-unit adjacency checks run on
  the grams' own positions;
* optional query rewrite: ``rewrite="spell"`` substitutes zero-df
  terms with their SymSpell correction, ``rewrite="suggest"``
  completes the trailing term from the QAC dictionary (reference
  SearchRewrite / SearchSuggest, `search.rs:1200-1411`);
* partition-pruned postings scan — only the query terms' ``tbucket``
  parquet partitions are read, with pushed-down term (and field)
  filters; term idf/flags are literal expressions, not a join;
  ``staged=[StagedBatch…]`` unions an uncommitted micro-batch's
  postings/stats into the same scan — the reference's realtime
  level-0 (`realtime_search.rs:921-2095`): a doc is searchable the
  moment staging finishes, before its commit;
* blocks that cannot contain a top-k doc are skipped via per-block
  score bounds computed at query time from (max_tf, min_dl) and the
  live avgdl (block-max WAND, reference `intersection.rs:2224-2233`,
  `single.rs:372-386`, metadata `compress_postinglist.rs:530-676`) —
  a ``mapInPandas`` kernel with a per-partition threshold heap, blocks
  visited in bound-descending order; facet filters (string-dictionary
  bytes AND numeric-range float64 arrays) and geo radius filters apply
  inside the kernel from per-block facet arrays (`search.rs:2543-2726`,
  geo `min_heap.rs` Point comparator); facet COUNTING over all matches
  also runs inside the scan (`add_result.rs:487-646`,
  `search.rs:3598-3764`);
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

import math
from collections.abc import Iterator
from dataclasses import dataclass, field as dc_field

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
from seekstorm_spark.index.builder import (
    NGRAM_SEP,
    decode_string_set_block,
    facet_code_dtype,
    facet_kind,
    facet_missing_code,
    facet_values,
)
from seekstorm_spark.index.store import IndexStore
from seekstorm_spark.quantization import _DECODE_NP
from seekstorm_spark.scoring import B, K, idf_f32
from seekstorm_spark.sqlexpr import double_array, double_array_sql
from seekstorm_spark.tokenizer import ParsedQuery, parse_query

# static 256-entry SmallFloat decode table as a literal-array SQL
# string, built once at import (see _annotated_postings)
_DLQ_ARRAY_SQL = double_array_sql(_DECODE_NP.tolist())

RESULT_SCHEMA = "docid long, score float"
COUNT_SCHEMA = "matches long"
FACET_COUNT_SCHEMA = "facet string, code long, matches long"
EARTH_RADIUS_KM = 6371.0

# per-index probed term stats: {(path, generation): {"df": {term: df},
# "missing": set()}}. The probe reads ONLY the query terms' tbucket
# partition files with pyarrow on the driver — no Spark job, and the
# read is bounded by vocabulary/n_buckets regardless of corpus size
# (the reference's in-RAM segment dictionary probe, search.rs:3066-3303).
_TERM_STATS_CACHE: dict[tuple, dict] = {}
# per-index cached delete sets: {(path, generation): np.ndarray}
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
    """Index-table generation: max mtime over the directory AND its
    immediate partition subdirs. Appends promote files INTO existing
    ``tbucket=`` subdirs via os.replace, which bumps the subdir mtime
    but not the parent's — keying on the parent alone left long-lived
    serving processes on the pre-append file listing."""
    import os

    try:
        m = os.path.getmtime(path)
        with os.scandir(path) as it:
            for e in it:
                if e.is_dir():
                    m = max(m, e.stat().st_mtime)
        return m
    except OSError:
        return -1.0


def _probe_stats_dir(
    path: str, terms: list[str], n_buckets: int
) -> dict[str, int]:
    """Raw driver-side probe of one (possibly log-structured)
    term-stats directory: term → Σ df across partial rows."""
    import os

    import pyarrow.compute as pc
    import pyarrow.dataset as pads

    if not terms or not os.path.exists(path):
        return {}
    buckets = sorted({term_bucket(t, n_buckets) for t in terms})
    dataset = pads.dataset(path, partitioning="hive")
    if "term" not in dataset.schema.names:
        return {}  # empty index: no data files → no columns at all
    flt = pc.field("term").isin(terms)
    if "tbucket" in dataset.schema.names:
        flt = pc.field("tbucket").isin(buckets) & flt
    tbl = dataset.to_table(columns=["term", "df"], filter=flt)
    out: dict[str, int] = {}
    for t, v in zip(tbl.column("term").to_pylist(), tbl.column("df").to_pylist()):
        out[t] = out.get(t, 0) + int(v)
    return out


def _probe_term_stats(
    store: IndexStore, terms: list[str], staged: list | None = None
) -> dict[str, int]:
    """term → df for the terms present in the index (driver-side
    partition-pruned parquet probe; cached per index generation).
    ``staged`` batches' term-stats deltas are probed uncached (tiny)
    and summed in — realtime level-0 stats."""
    if not terms:
        return {}
    key = (store.path, _dir_mtime(store.term_stats_path))
    entry = _TERM_STATS_CACHE.setdefault(key, {"df": {}, "missing": set()})
    need = [t for t in terms if t not in entry["df"] and t not in entry["missing"]]
    if need:
        found = _probe_stats_dir(store.term_stats_path, need, store.n_buckets)
        entry["df"].update(found)
        entry["missing"].update(t for t in need if t not in found)
    out = {t: entry["df"][t] for t in terms if t in entry["df"]}
    for sb in staged or []:
        extra = _probe_stats_dir(sb.term_stats_path, terms, store.n_buckets)
        for t, v in extra.items():
            out[t] = out.get(t, 0) + v
    return out


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


def _effective_stats(store: IndexStore, staged: list | None) -> tuple[int, float]:
    """(n_docs, avgdl) including any staged batches — f32 division per
    reference commit.rs:318-319."""
    if not staged:
        return store.n_docs, store.avgdl
    n = store.n_docs
    ps = int(store.meta.get("positions_sum_normalized", 0))
    for sb in staged:
        n += sb.batch_n
        ps += sb.batch_pos_sum
    avgdl = float(np.float32(ps) / np.float32(n)) if n else 1.0
    return n, avgdl


@dataclass
class QueryPlan:
    qtype: str  # union | intersection | phrase | ngram
    pos_terms: dict[str, float]  # ORIGINAL term -> f32 idf
    not_terms: list[str]
    phrase: list[tuple[str, int]]  # original (term, offset) incl. duplicates
    missing_required: bool
    # phrase→n-gram rewrite (NGRAM_SEARCH.md, tokenizer.rs:673-1387):
    # units = the phrase segmented into posting lookups — gram keys
    # (pre-joined adjacency postings carrying partial-term tfs) and
    # leftover single terms, each with its phrase offset. qtype
    # "ngram" = ONE unit covers the whole phrase (no positional join
    # at all); "phrase" with units aligns the units on the grams' own
    # positions. unit_parts maps gram key → its original terms.
    units: list[tuple[str, int]] | None = None
    unit_parts: dict[str, list[str]] = dc_field(default_factory=dict)

    def required_posting_terms(self) -> list[str]:
        """Posting terms the scan must find in a block for an
        intersection/phrase to match: the units' keys plus any
        positive term not covered by a unit (e.g. required terms
        outside the quoted span)."""
        if self.units is None:
            return sorted(self.pos_terms)
        covered: set[str] = set()
        for u, _off in self.units:
            covered.update(self.unit_parts.get(u, [u]))
        extra = [t for t in self.pos_terms if t not in covered]
        return sorted({u for u, _off in self.units} | set(extra))


def _classify(term: str, frequent: frozenset[str]) -> str:
    return "f" if term in frequent else "r"


def _segment_phrase(
    phrase_terms: list[str],
    frequent: frozenset[str],
    patterns: frozenset[str],
) -> list[tuple[str, int]]:
    """Greedy trigram-first segmentation of a phrase into posting
    units (reference rewrites longest-gram-first, index.rs:1833-1872).
    Returns [(posting term, phrase offset)] — gram keys where an
    enabled pattern matches, single terms elsewhere."""
    units: list[tuple[str, int]] = []
    fr = [_classify(t, frequent) for t in phrase_terms]
    i = 0
    n = len(phrase_terms)
    while i < n:
        if i + 3 <= n and "".join(fr[i : i + 3]) in patterns:
            units.append((NGRAM_SEP.join(phrase_terms[i : i + 3]), i))
            i += 3
        elif i + 2 <= n and "".join(fr[i : i + 2]) in patterns:
            units.append((NGRAM_SEP.join(phrase_terms[i : i + 2]), i))
            i += 2
        else:
            units.append((phrase_terms[i], i))
            i += 1
    return units


def _plan(
    spark: SparkSession,
    store: IndexStore,
    query: str,
    default_type: str,
    staged: list | None = None,
    rewrite: str | None = None,
    ngram_rewrite: bool = True,
    similarity: str = "bm25f",
    rewrite_options: dict | None = None,
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

    n_docs, _ = _effective_stats(store, staged)

    opts = rewrite_options or {}
    if (
        rewrite == "spell"
        and pq.terms
        # reference QueryRewriting.correct: corrections engage only
        # for query strings of at least this length (search.rs:108)
        and len(query) >= int(opts.get("correct") or 0)
    ):
        # SearchRewrite (reference search.rs:1200-1411): a query term
        # with df 0 is replaced by its best SymSpell correction before
        # planning, so misspellings return the corrected top-k
        from seekstorm_spark.query.spell import has_spell, spell_correct

        if has_spell(store):
            all_t = sorted({t.term for t in pq.terms})
            stats0 = _probe_term_stats(store, all_t, staged)
            subs: dict[str, str] = {}
            for t in all_t:
                if stats0.get(t, 0) == 0:
                    c = spell_correct(
                        store,
                        t,
                        max_edits=int(opts.get("distance", 2)),
                        term_length_threshold=opts.get(
                            "term_length_threshold"
                        ),
                    )
                    if c:
                        subs[t] = c[0]
            for qt in pq.terms:
                qt.term = subs.get(qt.term, qt.term)
    elif (
        rewrite == "suggest"
        and pq.terms
        # reference QueryRewriting.complete: min query-string length
        and len(query) >= int(opts.get("complete") or 0)
    ):
        # SearchSuggest: the trailing term is a prefix — complete it
        # from the QAC dictionary (reference search.rs:1200-1411)
        from seekstorm_spark.query.spell import complete, has_completions

        if has_completions(store):
            sugg = complete(store, pq.terms[-1].term, k=1)
            if sugg:
                pq.terms[-1].term = sugg[0][0]

    pos = sorted({t.term for t in pq.positive_terms})
    nots = sorted({t.term for t in pq.not_terms})
    phrase = [(t.term, t.phrase_index) for t in pq.terms if t.op == "phrase"]
    all_terms = sorted(set(pos) | set(nots))
    if not all_terms:
        return QueryPlan(pq.query_type, {}, [], [], False)

    # phrase → n-gram rewrite: segment the phrase greedily onto the
    # gram patterns this index materialized; a single covering unit
    # needs no positional join at all, multiple units align on the
    # grams' positions instead of every term's
    frequent = frozenset(meta.get("frequent_terms") or [])
    patterns = frozenset(meta.get("ngram_patterns") or [])
    units = None
    unit_parts: dict[str, list[str]] = {}
    if (
        ngram_rewrite
        and pq.query_type == "phrase"
        and patterns
        and len(phrase) >= 2
        and [off for _t, off in phrase] == list(range(len(phrase)))
    ):
        cand_units = _segment_phrase(
            [t for t, _off in phrase], frequent, patterns
        )
        if any(NGRAM_SEP in u for u, _off in cand_units):
            units = cand_units
            unit_parts = {
                u: u.split(NGRAM_SEP)
                for u, _off in units
                if NGRAM_SEP in u
            }

    probe_terms = sorted(set(all_terms) | set(unit_parts))
    df_by_term = _probe_term_stats(store, probe_terms, staged)
    pos_idf = {
        t: float(idf_f32(n_docs, df_by_term[t]))
        for t in pos
        if t in df_by_term
    }
    missing = any(t not in df_by_term for t in pos)
    missing_required = missing and pq.query_type in ("intersection", "phrase")
    if units is not None and not missing:
        # an indexed-pattern gram with both parts present but no
        # posting means the sequence is never adjacent anywhere →
        # the phrase matches nothing
        if any(g not in df_by_term for g in unit_parts):
            return QueryPlan("ngram", {}, nots, phrase, True)
        qtype = "ngram" if len(units) == 1 else "phrase"
        if similarity == "bm25f_proximity" and unit_parts:
            # Bm25fProximity (reference LexicalSimilarity,
            # index.rs:558-568, add_result.rs:917-941,
            # search.rs:3221-3231): each gram unit scores as ONE
            # posting with the GRAM's own df/tf — term adjacency is
            # honored in the relevance score instead of decomposing
            # into partial-term df/tf. Keying pos_terms by the units
            # and emptying unit_parts makes every kernel score the
            # gram row's tf with the gram idf (and bound with the
            # gram max_tf) without any kernel change; the partial-tf
            # columns are simply never read.
            prox_terms = {
                u: float(idf_f32(n_docs, df_by_term[u]))
                for u, _off in units
            }
            return QueryPlan(
                qtype=qtype,
                pos_terms=prox_terms,
                not_terms=[t for t in nots if t in df_by_term],
                phrase=phrase,
                missing_required=False,
                units=units,
                unit_parts={},
            )
        return QueryPlan(
            qtype=qtype,
            pos_terms=pos_idf,
            not_terms=[t for t in nots if t in df_by_term],
            phrase=phrase,
            missing_required=False,
            units=units,
            unit_parts=unit_parts,
        )
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
    facet_filters: dict | None,
    result_sort: list[tuple[str, str]] | None,
    geo_filter: dict | None = None,
) -> tuple[dict, list[str], dict[str, list[str] | None], dict[str, str]]:
    """(facet → kernel filter spec, facets the kernel must emit,
    facet dictionaries (None for numeric), facet kinds).

    String facets filter on a byte allow-list against the SORTED value
    dictionary written at build time; numeric facets filter on a
    closed [lo, hi] range over the raw per-block float64 array."""
    specs: dict = store.meta.get("facets") or {}
    kinds = {name: facet_kind(spec) for name, spec in specs.items()}
    dicts = {name: facet_values(spec) for name, spec in specs.items()}
    filters_k: dict = {}
    for fname, values in (facet_filters or {}).items():
        if fname not in specs:
            raise ValueError(f"unknown facet {fname!r}; indexed: {list(specs)}")
        if kinds[fname] in ("point", "morton"):
            raise ValueError(
                f"facet {fname!r} is a Point facet — filter it with "
                "geo_filter={'point': name, 'at': (lat, lon), "
                "'radius_km': r}"
            )
        if kinds[fname] == "numeric":
            lo, hi = values
            filters_k[fname] = ("numeric", float(lo), float(hi))
        else:
            # string / string_set: value list → dictionary-code
            # allow-list in the code dtype of this cardinality
            lookup = {v: i for i, v in enumerate(dicts[fname])}
            allowed = sorted(lookup[v] for v in values if v in lookup)
            filters_k[fname] = (
                kinds[fname],
                np.asarray(allowed, dtype=facet_code_dtype(len(lookup))),
                len(lookup),
            )
    emit = []
    for key, _dir in result_sort or []:
        if key in ("score", "docid") or key == "geo_dist":
            continue
        if key not in specs:
            raise ValueError(f"unknown sort facet {key!r}; indexed: {list(specs)}")
        if kinds[key] == "string_set":
            raise ValueError(
                f"facet {key!r} is multi-valued (string_set) — not a "
                "sort key"
            )
        if kinds[key] in ("point", "morton"):
            raise ValueError(
                f"facet {key!r} is a Point facet — sort on 'geo_dist'"
            )
        emit.append(key)
    if geo_filter:
        if "point" in geo_filter:
            c = geo_filter["point"]
            if c not in specs or kinds[c] not in ("point", "morton"):
                raise ValueError(
                    f"geo filter needs a Point facet column {c!r}; "
                    f"indexed: {list(specs)}"
                )
        else:
            for c in (geo_filter["lat"], geo_filter["lon"]):
                if c not in specs or kinds[c] != "numeric":
                    raise ValueError(
                        f"geo filter needs numeric facet column {c!r}; "
                        f"indexed: {list(specs)}"
                    )
    return filters_k, emit, dicts, kinds


def _fallback_union_query(query: str) -> str:
    """Strip the required-term operator from every token: the AND→OR
    fallback retry scores the same terms under union semantics
    (reference search.rs:3555-3559). Intersection queries carry no
    quoted phrases (those plan as qtype phrase/ngram and are excluded
    from fallback), so whitespace tokenization is exact here."""
    out = []
    for tok in query.split():
        out.append(tok[1:] if tok.startswith("+") and len(tok) > 1 else tok)
    return " ".join(out)


def _dict_bmp_only(
    store: IndexStore, facet: str, dicts: dict[str, list[str] | None]
) -> bool:
    """True iff every value of ``facet``'s frozen dictionary is in the
    Basic Multilingual Plane. Memoized on the store object (the
    dictionary is frozen for the life of the index — appends reject
    out-of-dictionary values — so the flag never changes)."""
    cache = getattr(store, "_bmp_only_cache", None)
    if cache is None:
        cache = store._bmp_only_cache = {}
    flag = cache.get(facet)
    if flag is None:
        values = dicts.get(facet) or ()
        flag = all(
            (not v) or max(map(ord, v)) <= 0xFFFF for v in values
        )
        cache[facet] = flag
    return flag


def _normalize_geo(gf: dict | None) -> tuple[dict | None, str]:
    """Accept the radius in km (``radius_km``) or miles
    (``radius_mi``, reference DistanceUnit) and an optional ``unit``
    ("km"|"mi") for the EMITTED ``geo_dist``; internally everything
    runs in km."""
    if not gf:
        return gf, "km"
    from seekstorm_spark.functions.geo import KM_PER_MILE

    gf = dict(gf)
    unit = gf.pop("unit", "mi" if "radius_mi" in gf else "km")
    if unit not in ("km", "mi"):
        raise ValueError(f"geo unit must be 'km' or 'mi', got {unit!r}")
    if "radius_mi" in gf:
        if "radius_km" in gf:
            raise ValueError("give radius_km OR radius_mi, not both")
        gf["radius_km"] = float(gf.pop("radius_mi")) * KM_PER_MILE
    return gf, unit


def _empty_result(
    spark: SparkSession,
    emit_facets: list[str],
    kinds: dict[str, str],
    want_dist: bool,
) -> DataFrame:
    """Empty result with the SAME schema the kernel path produces —
    including requested sort-facet columns (a plain RESULT_SCHEMA here
    broke callers selecting the sort facet on empty-plan queries)."""
    parts = ["docid long"]
    for fc in emit_facets:
        parts.append(f"{fc} " + ("double" if kinds[fc] == "numeric" else "string"))
    if want_dist:
        parts.append("geo_dist double")
    parts.append("score float")
    return spark.createDataFrame([], ", ".join(parts))


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
    facet_filters: dict | None = None,
    result_sort: list[tuple[str, str]] | None = None,
    staged: list | None = None,
    rewrite: str | None = None,
    rewrite_options: dict | None = None,
    geo_filter: dict | None = None,
    ngram_rewrite: bool = True,
    mode: str = "lexical",
    vector: list[float] | None = None,
    ann_index=None,
    vectors: DataFrame | None = None,
    rrf_k: float | None = None,
    similarity: str = "bm25f",
    enable_fallback: bool = False,
) -> DataFrame:
    """Top-k BM25(F) search → DataFrame(docid[, sort facets…], score),
    score f32. ``prune=False`` disables the WAND threshold (used to
    verify pruning is lossless). ``fields`` sets per-field boosts;
    ``field_filter`` restricts match+score fields; ``facet_filters``
    restricts results to docs whose facet value is allowed — string
    facets take a value list, numeric facets a (lo, hi) closed range —
    applied INSIDE the kernel via per-block facet arrays, so top-k
    pruning stays admissible (reference search.rs:2543-2726);
    ``result_sort`` orders by facet/score/docid keys (multi-key sort,
    reference min_heap.rs:56-546) — pruning is disabled then, since a
    non-score primary key invalidates the score threshold; ``staged``
    unions uncommitted micro-batches into the query (realtime level-0,
    reference realtime_search.rs:921-2095); ``rewrite`` applies spell
    correction / QAC completion to the query before planning —
    ``rewrite_options`` carries the reference QueryRewriting knobs
    (search.rs:107-160): ``correct``/``complete`` = min query-string
    length to engage, ``distance`` = base edit budget,
    ``term_length_threshold`` = per-term-length budgets;
    ``geo_filter`` = {"lat": facet, "lon": facet, "at": (lat, lon),
    "radius_km": r} keeps only docs within the haversine radius
    (reference geo Point facets, search.rs:2712-2724) — sort on
    "geo_dist" to order by distance.

    ``mode="hybrid"`` fuses the lexical top-k with a vector top-k by
    Reciprocal Rank Fusion, k=0.6 (the reference's hybrid SearchMode,
    search.rs:73-96,1962-2035) → DataFrame(docid, rrf_score). The
    vector side is ``ann_index.search(...)`` when an :class:`AnnIndex`
    / :class:`IvfIndex` is given (partition-pruned probe), else exact
    cosine top-k over ``vectors`` (vec_id must be the docid space).
    Both branches land in ONE returned DataFrame — a single action.

    ``similarity="bm25f_proximity"`` (the reference's DEFAULT
    LexicalSimilarity, index.rs:558-568): phrase units rewritten onto
    n-gram postings score with the GRAM's df/tf instead of the
    partial terms' — adjacent terms rank by the (rarer) gram idf, so
    proximity is honored in relevance (NGRAM_SEARCH.md "N-grams and
    BM25"). Queries with no gram unit score identically to "bm25f".

    ``enable_fallback=True`` (the reference's default-off
    ``Index.enable_fallback``, search.rs:3555-3559): an intersection
    yielding fewer than ``top_k`` results is retried as a UNION of
    the same terms (AND→OR), filling the page with partial matches.
    Phrase queries and queries with a missing required term are not
    retried (a tokenizer miss breaks the reference's fallback loop,
    search.rs:3290-3294). Costs one bounded count action on the
    strict result when enabled."""
    if mode not in ("lexical", "hybrid"):
        raise ValueError(f"unknown search mode {mode!r}")
    if similarity not in ("bm25f", "bm25f_proximity"):
        raise ValueError(f"unknown similarity {similarity!r}")
    if mode == "hybrid":
        if vector is None:
            raise ValueError("hybrid search requires vector=")
        if result_sort or geo_filter or offset:
            raise ValueError(
                "hybrid search fuses by RRF rank; result_sort / "
                "geo_filter / offset are not supported in this mode"
            )
        from seekstorm_spark.functions.fusion import RRF_K, rrf_fuse

        lex = search(
            spark, store, query, top_k=top_k, default_type=default_type,
            prune=prune, fields=fields, field_filter=field_filter,
            facet_filters=facet_filters, staged=staged, rewrite=rewrite,
            rewrite_options=rewrite_options,
            ngram_rewrite=ngram_rewrite, similarity=similarity,
        )
        if ann_index is not None:
            vec = ann_index.search(spark, [float(x) for x in vector], k=top_k)
        elif vectors is not None:
            from seekstorm_spark.functions.simsearch import cosine_topk

            vec = cosine_topk(vectors, [float(x) for x in vector], k=top_k)
        else:
            raise ValueError("hybrid search requires ann_index= or vectors=")
        return rrf_fuse(
            lex, vec.withColumnRenamed("vec_id", "docid"), id_col="docid",
            top_k=top_k, k=RRF_K if rrf_k is None else float(rrf_k),
        )
    if enable_fallback:
        base_kwargs = dict(
            top_k=top_k, offset=offset, prune=prune, fields=fields,
            field_filter=field_filter, facet_filters=facet_filters,
            result_sort=result_sort, staged=staged, rewrite=rewrite,
            rewrite_options=rewrite_options, geo_filter=geo_filter,
            ngram_rewrite=ngram_rewrite, similarity=similarity,
        )
        strict = search(
            spark, store, query, default_type=default_type, **base_kwargs
        )
        fb_plan = _plan(
            spark, store, query, default_type,
            list(staged) if staged else None, rewrite,
            ngram_rewrite=ngram_rewrite, similarity=similarity,
            rewrite_options=rewrite_options,
        )
        if (
            fb_plan.qtype == "intersection"
            and not fb_plan.missing_required
            and fb_plan.pos_terms
            and len(strict.take(top_k)) < top_k
        ):
            return search(
                spark, store, _fallback_union_query(query),
                default_type="union", **base_kwargs,
            )
        return strict
    staged = list(staged) if staged else None
    geo_filter, geo_unit = _normalize_geo(geo_filter)
    filters_k, emit_facets, dicts, kinds = _resolve_facets(
        store, facet_filters, result_sort, geo_filter
    )
    want_dist = bool(result_sort) and any(
        key == "geo_dist" for key, _d in result_sort or []
    )
    if want_dist and not geo_filter:
        raise ValueError("sorting by geo_dist requires geo_filter")
    plan = _plan(
        spark, store, query, default_type, staged, rewrite,
        ngram_rewrite=ngram_rewrite, similarity=similarity,
        rewrite_options=rewrite_options,
    )
    if plan.missing_required or not plan.pos_terms:
        if result_sort:
            return _empty_result(spark, emit_facets, kinds, want_dist)
        return spark.createDataFrame([], RESULT_SCHEMA)

    # frequent-term result cache (reference search.rs:3388-3445): an
    # unfiltered single-term query whose term was precomputed serves
    # driver-side — a LocalTableScan, zero Spark jobs. Any append /
    # delete / compaction moves the index generation and disables the
    # cache until it is rebuilt.
    from seekstorm_spark.query.result_cache import (
        cacheable_plan,
        cached_single_term,
    )

    if (
        not staged
        and facet_filters is None
        and result_sort is None
        and geo_filter is None
        and fields is None
        and field_filter is None
        and cacheable_plan(plan)
    ):
        hit = cached_single_term(
            store, next(iter(plan.pos_terms)), top_k + offset
        )
        if hit is not None:
            rows = hit[offset : offset + top_k]
            if not rows:
                return spark.createDataFrame([], RESULT_SCHEMA)
            # a VALUES literal plans as a LocalTableScan, whose
            # collect() runs driver-side with NO Spark job — a
            # parallelize-backed createDataFrame would schedule one.
            # repr(float) round-trips the f32 score exactly.
            values = ", ".join(
                f"(CAST({int(d)} AS BIGINT), CAST({s!r} AS FLOAT))"
                for d, s in rows
            )
            return spark.sql(
                f"SELECT docid, score FROM (VALUES {values}) "
                "AS t(docid, score)"
            )

    boosts, allowed = _resolve_fields(store, fields, field_filter)
    need_facets = sorted(set(filters_k) | set(emit_facets))
    block_bounds = None
    if geo_filter:
        geo_cols = (
            {geo_filter["point"]}
            if "point" in geo_filter
            else {geo_filter["lat"], geo_filter["lon"]}
        )
        need_facets = sorted(set(need_facets) | geo_cols)
        # block-level zone skipping: blocks whose stored lat/lon
        # min/max fall outside the radius' conservative boxes drop
        # before any posting decode (clamped + antimeridian-split, so
        # the skip is lossless)
        from seekstorm_spark.functions.geo import geo_boxes_for_radius

        boxes = geo_boxes_for_radius(
            float(geo_filter["at"][0]), float(geo_filter["at"][1]),
            float(geo_filter["radius_km"]),
        )
        if "point" in geo_filter:
            # a Point facet's zone bounds carry latitude min/max
            block_bounds = {
                geo_filter["point"]: [(b[0], b[1]) for b in boxes],
            }
        else:
            block_bounds = {
                geo_filter["lat"]: [(b[0], b[1]) for b in boxes],
                geo_filter["lon"]: [(b[2], b[3]) for b in boxes],
            }
    # numeric range facet filters get the same zone-map skip
    for name, spec in (filters_k or {}).items():
        if spec[0] == "numeric":
            block_bounds = block_bounds or {}
            block_bounds.setdefault(name, []).append(
                (float(spec[1]), float(spec[2]))
            )
    n_docs, avgdl = _effective_stats(store, staged)
    need_k = top_k + offset
    emit_all = bool(result_sort)
    # numeric OR string primary sort key → v5 zone bounds drive a
    # block-level skip (top-k by key keeps a key-threshold in place of
    # the score threshold the emit-all path gives up). String keys
    # skip on dictionary CODES — byte order == value order by the
    # frozen-dictionary invariant, so the code threshold is the value
    # threshold; missing codes (dtype max) never enter the heap, which
    # is exactly the nulls-last contract the final sort applies.
    sort_prune = None
    if (
        emit_all
        and prune
        and not staged  # a staged slice may lack zone bounds
        and result_sort[0][0] in kinds
        and kinds[result_sort[0][0]] in ("numeric", "string")
        and (
            kinds[result_sort[0][0]] == "numeric"
            # string keys: code order == value order holds only while
            # every comparison backend agrees on the order of the
            # VALUES themselves. The dictionary is sorted in Python
            # (code-point order); Spark's final orderBy may compare
            # UTF-16 code units, which diverges from code-point order
            # exactly when supplementary-plane characters are present
            # (they sort before U+E000..U+FFFF in UTF-16). Engage the
            # code-zone skip only for BMP-only dictionaries, where all
            # three orders (code point, UTF-8 byte, UTF-16 unit)
            # coincide; otherwise fall back to the unpruned emit-all
            # path (correct, just slower).
            or _dict_bmp_only(store, result_sort[0][0], dicts)
        )
    ):
        sort_prune = (result_sort[0][0], result_sort[0][1], need_k)
    rows = _annotated_postings(
        spark, store, plan, boosts, allowed, facet_cols=need_facets,
        staged=staged, avgdl=avgdl, block_bounds=block_bounds,
        keep_bounds=[sort_prune[0]] if sort_prune else None,
    )

    kernel = _make_kernel(
        plan, need_k, prune and not emit_all, avgdl,
        block_size=int(store.meta.get('block_size', ROARING_BLOCK_SIZE)),
        deletes=_load_delete_set(spark, store),
        facet_filters_k=filters_k,
        emit_facets=emit_facets,
        facet_kinds=kinds,
        facet_sizes={
            n: len(v) for n, v in dicts.items() if v is not None
        },
        emit_all=emit_all,
        geo=geo_filter,
        emit_dist=want_dist,
        sort_prune=sort_prune,
    )
    schema = RESULT_SCHEMA
    for fc in emit_facets:
        schema += f", fb_{fc} " + (
            "double" if kinds[fc] == "numeric" else "long"
        )
    if want_dist:
        schema += ", geo_dist double"
    # rows are already hash-partitioned by block_id (the block-bound
    # window's exchange) — no extra repartition needed. Key-sorted
    # queries schedule blocks by their zone bound (best key first) so
    # the kernel's key-threshold tightens as early as possible;
    # unknown-bound blocks go first (they can never be skipped).
    # Pre-v5 facet files carry no vmin/vmax, so the zb columns may be
    # absent — fall back to the default schedule then (the kernel's
    # skip guard already tolerates the missing columns).
    zb_col = (
        f"zb_{'min' if sort_prune and sort_prune[1] == 'asc' else 'max'}"
        f"_{sort_prune[0]}"
        if sort_prune
        else None
    )
    if sort_prune is not None and zb_col in rows.columns:
        zb = (
            F.col(zb_col).asc_nulls_first()
            if sort_prune[1] == "asc"
            else F.col(zb_col).desc_nulls_first()
        )
        order_cols = [zb, F.col("block_id"), F.col("term"), F.col("field")]
    else:
        order_cols = [
            F.col("block_bound").desc(), F.col("block_id"),
            F.col("term"), F.col("field"),
        ]
    candidates = rows.sortWithinPartitions(*order_cols).mapInPandas(
        kernel, schema=schema
    )
    if want_dist and geo_unit == "mi":
        # kernel distances are km; the requested unit only rescales
        # the emitted column (sort order is unit-invariant)
        from seekstorm_spark.functions.geo import KM_PER_MILE

        candidates = candidates.withColumn(
            "geo_dist", F.col("geo_dist") / F.lit(KM_PER_MILE)
        )

    if result_sort:
        # decode facet bytes → values (sorted dictionary ⇒ byte order
        # is value order), then multi-key sort
        out_cols = [F.col("docid")]
        for fc in emit_facets:
            if kinds[fc] == "numeric":
                candidates = candidates.withColumn(
                    fc,
                    F.when(
                        F.isnan(F.col(f"fb_{fc}")), F.lit(None).cast("double")
                    ).otherwise(F.col(f"fb_{fc}")),
                )
            elif len(dicts[fc]) <= _DICT_LITERAL_MAX:
                arr = F.array(*[F.lit(v) for v in dicts[fc]])
                missing = facet_missing_code(len(dicts[fc]))
                candidates = candidates.withColumn(
                    fc,
                    F.when(
                        F.col(f"fb_{fc}") == missing,
                        F.lit(None).cast("string"),
                    ).otherwise(
                        F.element_at(arr, (F.col(f"fb_{fc}") + 1).cast("int"))
                    ),
                )
            else:
                # wide dictionary: broadcast join instead of a
                # cardinality-sized literal array (the missing
                # sentinel ≥ len(dict) left-joins to NULL)
                dict_df = spark.createDataFrame(
                    list(enumerate(dicts[fc])),
                    f"__code_{fc} long, {fc} string",
                )
                candidates = candidates.join(
                    F.broadcast(dict_df),
                    F.col(f"fb_{fc}") == F.col(f"__code_{fc}"),
                    "left",
                ).drop(f"__code_{fc}")
            out_cols.append(F.col(fc))
        if want_dist:
            out_cols.append(F.col("geo_dist"))
        out_cols.append(F.col("score"))
        order = []
        for key, direction in result_sort:
            col = F.col(key)
            if kinds.get(key) == "numeric":
                # docs without the key sort LAST either direction —
                # required for the zone-bound block skip to be
                # admissible (a missing-key doc can never outrank
                # need_k docs with keys), and the ordering a user
                # expects from "sort by price"
                order.append(
                    col.desc_nulls_last()
                    if direction == "desc"
                    else col.asc_nulls_last()
                )
            else:
                # string keys: the same nulls-last contract as numeric
                # (required for the code-zone block skip to be
                # admissible — a missing-key doc never outranks need_k
                # keyed docs — and it matches DuckDB's default order)
                order.append(
                    col.desc_nulls_last()
                    if direction == "desc"
                    else col.asc_nulls_last()
                )
        order.append(F.col("docid").asc())
        out = candidates.select(*out_cols).orderBy(*order)
    else:
        out = candidates.orderBy(F.col("score").desc(), F.col("docid").asc())
    if offset:
        out = out.offset(offset)
    return out.limit(top_k)


_DICT_LITERAL_MAX = 4096


def _decode_string_codes(
    spark: SparkSession,
    df: DataFrame,
    vals_by_facet: dict[str, list],
    out_col: str,
    code_col: str = "code",
    facet_col: str = "facet",
) -> DataFrame:
    """Decode (facet, code) → dictionary value as new ``out_col``.

    Small dictionaries decode inline with a literal array (no join, no
    exchange); past ``_DICT_LITERAL_MAX`` total values the mapping is
    a BROADCAST-joined dictionary DataFrame instead — a Catalyst
    literal expression sized by dictionary cardinality would explode
    plan size long before the reference's String32 (2^32) bound."""
    total = sum(len(v) for v in vals_by_facet.values())
    if total <= _DICT_LITERAL_MAX:
        decode = None
        for fc in sorted(vals_by_facet):
            arr = F.array(*[F.lit(v) for v in vals_by_facet[fc]])
            expr = F.element_at(arr, F.col(code_col).cast("int") + 1)
            decode = (
                expr
                if decode is None
                else F.when(F.col(facet_col) == fc, expr).otherwise(decode)
            )
        return df.withColumn(out_col, decode)
    dict_df = spark.createDataFrame(
        [
            (fc, i, v)
            for fc, vals in vals_by_facet.items()
            for i, v in enumerate(vals)
        ],
        "__dict_facet string, __dict_code long, __dict_value string",
    )
    return (
        df.join(
            F.broadcast(dict_df),
            (F.col(facet_col) == F.col("__dict_facet"))
            & (F.col(code_col).cast("long") == F.col("__dict_code")),
            "left",
        )
        .drop("__dict_facet", "__dict_code")
        .withColumnRenamed("__dict_value", out_col)
    )


def search_many(
    spark: SparkSession,
    store: IndexStore,
    queries: list[str],
    top_k: int = 10,
    default_type: str = "union",
    prune: bool = True,
    fields: list[tuple[str, float]] | None = None,
    field_filter: list[str] | None = None,
    staged: list | None = None,
    facet_filters: list[dict | None] | None = None,
    geo_filters: list[dict | None] | None = None,
    result_sorts: list[list[tuple[str, str]] | None] | None = None,
    similarity: str = "bm25f",
) -> DataFrame:
    """Execute N queries in ONE Spark action → DataFrame(query_id,
    docid, score); ``query_id`` is the position in ``queries``.

    Throughput-bound serving pays Spark's per-action floor (driver
    scheduling + plan optimization + one exchange per query, ~0.5 s
    on this box) per ``search`` call. Here every query shape —
    union / intersection / NOT / phrase / n-gram — FUSES into one
    pipeline: a single scan over the union of all queries' (tbucket,
    term) postings, one exchange by block_id, and one kernel that
    decodes each posting row once and scores every query against it
    (per-query top-k heaps + block-max thresholds, gram source maps,
    and phrase alignment, so pruning and rewrites stay per query).
    Only staged level-0 queries fall back to their exact single-query
    plans as extra union branches in the SAME action. Per-query
    results are bit-identical to :func:`search` — same f32
    accumulation order, same tiebreaks. The reference serves
    concurrent queries the same way — shared index, per-query
    execution state (its multi-threaded QPS bench).

    ``facet_filters`` / ``geo_filters`` are optional per-query lists
    parallel to ``queries`` (None entries = unfiltered): each query's
    facet predicates and haversine radius apply inside the SAME fused
    kernel from the shared per-block facet arrays (one buffer decode
    per block, every query's candidate set filtered against it),
    exactly as ``search(facet_filters=…, geo_filter=…)`` does for one
    query. (Per-query zone-bound block skipping doesn't apply to the
    shared scan.)

    ``result_sorts`` (parallel to ``queries``; None entries keep the
    score order) currently supports ``[("geo_dist", "asc"|"desc")]``
    per query — that query's results order by its haversine distance
    instead of score, bit-identical to ``search(result_sort=…)``, and
    the output gains a ``geo_dist`` column (km, or miles for a query
    whose filter used ``radius_mi``/``unit="mi"``; NaN for
    score-sorted queries). Distance top-k is kept per partition inside
    the fused kernel, so a geo-sorted query rides the same single
    action.

    Queries answerable from the frequent-term result cache (single
    cached term, no per-query filters/sort) are spliced in as
    local-relation branches — their terms never enter the fused scan
    and their rows cost no Spark work, exactly as in ``search``."""
    from functools import reduce

    if facet_filters is not None and len(facet_filters) != len(queries):
        raise ValueError("facet_filters must parallel queries")
    if geo_filters is not None and len(geo_filters) != len(queries):
        raise ValueError("geo_filters must parallel queries")
    mi_qs: list[int] = []
    dist_sort_by_q: dict[int, str] = {}
    if result_sorts is not None:
        if len(result_sorts) != len(queries):
            raise ValueError("result_sorts must parallel queries")
        for i, rs in enumerate(result_sorts):
            if not rs:
                continue
            if len(rs) != 1 or rs[0][0] != "geo_dist" or rs[0][1] not in (
                "asc", "desc",
            ):
                raise ValueError(
                    "batched result_sorts support [('geo_dist', "
                    "'asc'|'desc')] per query"
                )
            if geo_filters is None or not geo_filters[i]:
                raise ValueError(
                    f"query {i}: sorting by geo_dist requires a geo_filter"
                )
            dist_sort_by_q[i] = rs[0][1]
    if similarity not in ("bm25f", "bm25f_proximity"):
        raise ValueError(f"unknown similarity {similarity!r}")
    plans = [
        _plan(spark, store, qstr, default_type, staged, similarity=similarity)
        for qstr in queries
    ]
    boosts, allowed = _resolve_fields(store, fields, field_filter)
    n_docs, avgdl = _effective_stats(store, staged)
    filters_by_q: dict[int, dict] = {}
    geo_by_q: dict[int, dict] = {}
    fsizes: dict[str, int] = {}
    if facet_filters is not None:
        specs: dict = store.meta.get("facets") or {}
        for i, ff in enumerate(facet_filters):
            if not ff:
                continue
            fk, _emit, _dicts_i, _kinds = _resolve_facets(store, ff, None)
            filters_by_q[i] = fk
            for name in ff:
                vals = facet_values(specs[name])
                if vals is not None:
                    fsizes[name] = len(vals)
    if geo_filters is not None:
        for i, gf in enumerate(geo_filters):
            if not gf:
                continue
            gf, unit = _normalize_geo(gf)
            _resolve_facets(store, None, None, geo_filter=gf)  # validate
            geo_by_q[i] = dict(gf)
            if unit == "mi":
                mi_qs.append(i)

    from seekstorm_spark.query.result_cache import (
        cacheable_plan,
        cached_single_term,
    )

    use_cache = not staged and fields is None and field_filter is None
    cached_by_q: dict[int, list] = {}
    fused: list[tuple[int, QueryPlan]] = []
    fallback: list[int] = []
    for i, plan in enumerate(plans):
        if plan.missing_required or not plan.pos_terms:
            continue  # no results by construction
        if (
            use_cache
            and filters_by_q.get(i) is None
            and geo_by_q.get(i) is None
            and i not in dist_sort_by_q
            and cacheable_plan(plan)
        ):
            # frequent-term result cache: this query's top-k is
            # already precomputed — serve it as a local-relation
            # branch and keep its terms OUT of the fused scan
            hit = cached_single_term(
                store, next(iter(plan.pos_terms)), top_k
            )
            if hit is not None:
                cached_by_q[i] = hit[:top_k]
                continue
        if not staged:
            fused.append((i, plan))
        else:
            # staged level-0 unions per-query staged readers — run the
            # exact single-query plan as a branch in the same action
            fallback.append(i)

    with_dist = result_sorts is not None
    out_schema = "query_id int, " + RESULT_SCHEMA + (
        ", geo_dist double" if with_dist else ""
    )
    out_cols = ["query_id", "docid", "score"] + (
        ["geo_dist"] if with_dist else []
    )
    outs: list[DataFrame] = []
    if fused:
        partials = _search_many_fused(
            spark, store, fused, top_k, prune, boosts, allowed, avgdl,
            facet_filters_by_q=filters_by_q or None,
            geo_by_q=geo_by_q or None,
            facet_sizes=fsizes or None,
            dist_sort_by_q=dist_sort_by_q if with_dist else None,
        )
        score_w = Window.partitionBy("query_id").orderBy(
            F.col("score").desc(), F.col("docid").asc()
        )
        branches = [
            (
                partials.filter(
                    ~F.col("query_id").isin(list(dist_sort_by_q))
                )
                if dist_sort_by_q
                else partials,
                score_w,
            )
        ]
        for direction in sorted(set(dist_sort_by_q.values())):
            qis = [q for q, d in dist_sort_by_q.items() if d == direction]
            dcol = (
                F.col("geo_dist").asc()
                if direction == "asc"
                else F.col("geo_dist").desc()
            )
            branches.append(
                (
                    partials.filter(F.col("query_id").isin(qis)),
                    Window.partitionBy("query_id").orderBy(
                        dcol, F.col("docid").asc()
                    ),
                )
            )
        for part, w in branches:
            outs.append(
                part.withColumn("rn", F.row_number().over(w))
                .filter(F.col("rn") <= top_k)
                .select(*out_cols)
            )
    flat_cached = [
        (qi, d, s) for qi, rows in cached_by_q.items() for d, s in rows
    ]
    if flat_cached:
        values = ", ".join(
            f"(CAST({int(qi)} AS INT), CAST({int(d)} AS BIGINT), "
            f"CAST({s!r} AS FLOAT))"
            for qi, d, s in flat_cached
        )
        cdf = spark.sql(
            f"SELECT query_id, docid, score FROM (VALUES {values}) "
            "AS t(query_id, docid, score)"
        )
        if with_dist:
            cdf = cdf.withColumn(
                "geo_dist", F.lit(float("nan")).cast("double")
            )
        outs.append(cdf)
    for i in fallback:
        rs = (
            [("geo_dist", dist_sort_by_q[i])] if i in dist_sort_by_q else None
        )
        out = search(
            spark, store, queries[i], top_k=top_k,
            default_type=default_type, prune=prune, fields=fields,
            field_filter=field_filter, staged=staged,
            facet_filters=facet_filters[i] if facet_filters else None,
            geo_filter=geo_filters[i] if geo_filters else None,
            result_sort=rs, similarity=similarity,
        )
        sel = [
            F.lit(int(i)).alias("query_id"),
            F.col("docid"),
            F.col("score"),
        ]
        if with_dist:
            sel.append(
                F.col("geo_dist")
                if "geo_dist" in out.columns
                else F.lit(float("nan")).cast("double").alias("geo_dist")
            )
        outs.append(out.select(*sel))
    if not outs:
        return spark.createDataFrame([], out_schema)
    result = reduce(lambda a, b: a.unionByName(b), outs)
    # kernel distances are km; a FUSED query whose filter was given in
    # miles gets its emitted column rescaled (order is unit-invariant,
    # so the distance sort already happened correctly). Staged
    # fallbacks went through search(), which rescales itself.
    mi_rescale = sorted(set(mi_qs) - set(fallback))
    if with_dist and mi_rescale:
        from seekstorm_spark.functions.geo import KM_PER_MILE

        result = result.withColumn(
            "geo_dist",
            F.when(
                F.col("query_id").isin([int(i) for i in mi_rescale]),
                F.col("geo_dist") / F.lit(KM_PER_MILE),
            ).otherwise(F.col("geo_dist")),
        )
    return result


def search_many_hybrid(
    spark: SparkSession,
    store: IndexStore,
    queries: list[str],
    vectors: list[list[float]],
    top_k: int = 10,
    default_type: str = "union",
    ann_index=None,
    vectors_df: DataFrame | None = None,
    rrf_k: float | None = None,
    similarity: str = "bm25f",
    staged: list | None = None,
) -> DataFrame:
    """Batched hybrid serving: N (query, vector) pairs in ONE Spark
    action → DataFrame(query_id, docid, rrf_score).

    The lexical side rides the fused :func:`search_many` kernel (one
    scan over the union of all queries' postings); each query's
    vector top-k is a partition-pruned ``ann_index.search`` probe
    (or exact cosine over ``vectors_df``) unioned in as a branch of
    the same plan; RRF (k=0.6, reference search.rs:73-96,1962-2035)
    fuses per query with window ranks partitioned by query_id. Every
    per-query slice is bit-identical to ``search(mode="hybrid")`` —
    same ranks, same round(·, 6), same docid tiebreaks."""
    from functools import reduce

    from seekstorm_spark.functions.fusion import RRF_K

    if len(vectors) != len(queries):
        raise ValueError("vectors must parallel queries")
    if ann_index is None and vectors_df is None:
        raise ValueError("hybrid search requires ann_index= or vectors_df=")
    lex = search_many(
        spark, store, queries, top_k=top_k, default_type=default_type,
        similarity=similarity, staged=staged,
    )
    from seekstorm_spark.functions.simsearch import cosine_topk

    branches = []
    for i, v in enumerate(vectors):
        v = [float(x) for x in v]
        probe = (
            ann_index.search(spark, v, k=top_k)
            if ann_index is not None
            else cosine_topk(vectors_df, v, k=top_k)
        )
        branches.append(
            probe.select(
                F.lit(i).alias("query_id"),
                F.col("vec_id").alias("docid"),
                F.col("cos_sim"),
            )
        )
    vec = reduce(lambda a, b: a.unionByName(b), branches)
    k = RRF_K if rrf_k is None else float(rrf_k)
    lw = Window.partitionBy("query_id").orderBy(
        F.col("score").desc(), F.col("docid").asc()
    )
    vw = Window.partitionBy("query_id").orderBy(
        F.col("cos_sim").desc(), F.col("docid").asc()
    )
    lex_r = lex.select(
        "query_id", "docid", F.row_number().over(lw).alias("lex_rank")
    )
    vec_r = vec.select(
        "query_id", "docid", F.row_number().over(vw).alias("vec_rank")
    )
    fused = (
        lex_r.join(vec_r, ["query_id", "docid"], "full_outer")
        .withColumn(
            "rrf_score",
            F.round(
                F.coalesce(1.0 / (F.lit(k) + F.col("lex_rank")), F.lit(0.0))
                + F.coalesce(1.0 / (F.lit(k) + F.col("vec_rank")), F.lit(0.0)),
                6,
            ),
        )
    )
    fw = Window.partitionBy("query_id").orderBy(
        F.col("rrf_score").desc(), F.col("docid").asc()
    )
    return (
        fused.withColumn("rn", F.row_number().over(fw))
        .filter(F.col("rn") <= top_k)
        .select("query_id", "docid", "rrf_score")
        .orderBy(
            F.col("query_id").asc(),
            F.col("rrf_score").desc(),
            F.col("docid").asc(),
        )
    )


def count_matches_many(
    spark: SparkSession,
    store: IndexStore,
    queries: list[str],
    default_type: str = "union",
    field_filter: list[str] | None = None,
    staged: list | None = None,
) -> list[int]:
    """Exact match counts for N queries — zero or ONE Spark action.

    Per-query df shortcuts answer driver-side (single terms and
    covering grams read their stored df from the pyarrow stat probe,
    as in :func:`count_matches`); everything else shares one fused
    scan + kernel in count mode. ``staged`` level-0 falls back to
    per-query :func:`count_matches` calls."""
    staged = list(staged) if staged else None
    plans = [
        _plan(spark, store, qstr, default_type, staged) for qstr in queries
    ]
    boosts, allowed = _resolve_fields(store, None, field_filter)
    _n, avgdl = _effective_stats(store, staged)
    import os

    has_deletes = os.path.exists(store.deletes_path)
    counts = dict.fromkeys(range(len(queries)), 0)
    kernel_plans: list[tuple[int, QueryPlan]] = []
    for i, plan in enumerate(plans):
        if plan.missing_required or not plan.pos_terms:
            continue
        if staged:
            counts[i] = count_matches(
                spark, store, queries[i], default_type, field_filter,
                staged,
            )
            continue
        if (
            len(plan.pos_terms) == 1
            and not plan.not_terms
            and plan.qtype not in ("phrase", "ngram")
            and field_filter is None
            and not has_deletes
        ):
            term = next(iter(plan.pos_terms))
            counts[i] = int(_probe_term_stats(store, [term]).get(term, 0))
            continue
        if plan.qtype == "ngram" and field_filter is None and not has_deletes:
            gram = plan.units[0][0]
            counts[i] = int(_probe_term_stats(store, [gram]).get(gram, 0))
            continue
        kernel_plans.append((i, plan))
    if kernel_plans:
        out = (
            _search_many_fused(
                spark, store, kernel_plans, 0, False, boosts, allowed,
                avgdl, count_only=True,
            )
            .groupBy("query_id")
            .agg(F.sum("matches").alias("m"))
            .collect()
        )
        for r in out:
            counts[int(r["query_id"])] = int(r["m"] or 0)
    return [counts[i] for i in range(len(queries))]


def facet_counts_many(
    spark: SparkSession,
    store: IndexStore,
    requests: list[tuple[str, list[str]]],
    default_type: str = "union",
    staged: list | None = None,
) -> DataFrame:
    """Facet-value counts for N queries in ONE Spark action →
    DataFrame(query_id, facet, value, n).

    ``requests`` is a list of (query, string/string_set facet names);
    ``query_id`` is the position in the list. Every query's matching
    docs are found by the same fused union-of-terms scan
    :func:`search_many` uses, the blocks' facet arrays join into that
    single action, and one kernel decodes each block's facet buffer
    once and tallies it against every query's candidates — per-query
    results identical to :func:`facet_counts` (the reference counts
    facets during result collection, add_result.rs:487-646; its server
    amortizes concurrent queries against the same in-RAM facet columns
    the same way). Numeric range facets stay on the single-query
    :func:`facet_range_counts` path. ``staged`` level-0 falls back to
    per-query :func:`facet_counts` calls unioned in one action."""
    from functools import reduce

    staged = list(staged) if staged else None
    specs: dict = store.meta.get("facets") or {}
    empty = spark.createDataFrame(
        [], "query_id int, facet string, value string, n long"
    )
    fsizes: dict[str, int] = {}
    all_facets: set[str] = set()
    for _qstr, fcs in requests:
        for fc in fcs:
            vals = facet_values(specs[fc]) if fc in specs else None
            if fc not in specs or vals is None:
                raise ValueError(f"{fc!r} is not an indexed string facet")
            fsizes[fc] = len(vals)
            all_facets.add(fc)
    if staged:
        outs = [
            facet_counts(
                spark, store, qstr, fcs, default_type, staged
            ).select(
                F.lit(int(i)).alias("query_id"), "facet", "value", "n"
            )
            for i, (qstr, fcs) in enumerate(requests)
        ]
        return reduce(lambda a, b: a.unionByName(b), outs) if outs else empty

    plans = [
        _plan(spark, store, qstr, default_type, None)
        for qstr, _fcs in requests
    ]
    boosts, allowed = _resolve_fields(store, None, None)
    _n, avgdl = _effective_stats(store, None)
    fused: list[tuple[int, QueryPlan]] = []
    count_facets_by_q: dict[int, dict] = {}
    for i, plan in enumerate(plans):
        if plan.missing_required or not plan.pos_terms:
            continue
        fused.append((i, plan))
        count_facets_by_q[i] = {
            fc: (facet_kind(specs[fc]), None) for fc in requests[i][1]
        }
    if not fused:
        return empty
    agg = (
        _search_many_fused(
            spark, store, fused, 0, False, boosts, allowed, avgdl,
            count_only=True,
            count_facets_by_q=count_facets_by_q,
            facet_sizes=fsizes,
        )
        .groupBy("query_id", "facet", "code")
        .agg(F.sum("matches").cast("long").alias("n"))
    )
    decoded = _decode_string_codes(
        spark, agg, {fc: facet_values(specs[fc]) for fc in all_facets},
        out_col="value",
    )
    return decoded.select("query_id", "facet", "value", "n")


def facet_range_counts_many(
    spark: SparkSession,
    store: IndexStore,
    requests: list[tuple[str, dict]],
    default_type: str = "union",
    staged: list | None = None,
    cumulative: bool = False,
) -> DataFrame:
    """Numeric range-facet counts for N queries in ONE Spark action →
    DataFrame(query_id, facet, bucket_lo, n[, n_cumulative]).

    ``requests`` is a list of (query, {facet: ascending lower
    bounds}); bucket sets may differ between queries for the same
    facet. Same fused scan + shared per-block buffer decode as
    :func:`facet_counts_many`; per-query semantics identical to
    :func:`facet_range_counts`. ``staged`` falls back per query."""
    from functools import reduce

    staged = list(staged) if staged else None
    specs: dict = store.meta.get("facets") or {}
    base_cols = "query_id int, facet string, bucket_lo double, n long"
    empty = spark.createDataFrame(
        [],
        base_cols + (", n_cumulative long" if cumulative else ""),
    )
    for _q, ranges in requests:
        for fc in ranges:
            if fc not in specs or facet_kind(specs[fc]) != "numeric":
                raise ValueError(
                    f"{fc!r} is not an indexed numeric facet"
                )
    if staged:
        outs = [
            facet_range_counts(
                spark, store, qstr, ranges, default_type, staged,
                cumulative=cumulative,
            ).select(
                F.lit(int(i)).alias("query_id"), "*"
            )
            for i, (qstr, ranges) in enumerate(requests)
        ]
        return reduce(lambda a, b: a.unionByName(b), outs) if outs else empty

    plans = [
        _plan(spark, store, qstr, default_type, None)
        for qstr, _r in requests
    ]
    boosts, allowed = _resolve_fields(store, None, None)
    _n, avgdl = _effective_stats(store, None)
    fused: list[tuple[int, QueryPlan]] = []
    count_facets_by_q: dict[int, dict] = {}
    bounds_by_qf: dict[tuple[int, str], list[float]] = {}
    for i, plan in enumerate(plans):
        if plan.missing_required or not plan.pos_terms:
            continue
        fused.append((i, plan))
        spec: dict = {}
        for fc, bounds in requests[i][1].items():
            bs = sorted(float(b) for b in bounds)
            spec[fc] = ("numeric", np.asarray(bs, dtype=np.float64))
            bounds_by_qf[(i, fc)] = bs
        count_facets_by_q[i] = spec
    if not fused:
        return empty
    agg = (
        _search_many_fused(
            spark, store, fused, 0, False, boosts, allowed, avgdl,
            count_only=True,
            count_facets_by_q=count_facets_by_q,
            facet_sizes={},
        )
        .groupBy("query_id", "facet", "code")
        .agg(F.sum("matches").cast("long").alias("n"))
    )
    # bucket decode keys on (query_id, facet): bound sets may differ
    decode = F.lit(None).cast("double")
    for (qi, fc), bs in bounds_by_qf.items():
        arr = double_array(bs)
        decode = F.when(
            (F.col("query_id") == qi) & (F.col("facet") == fc),
            F.element_at(arr, F.col("code").cast("int") + 1),
        ).otherwise(decode)
    out = agg.select(
        "query_id", "facet", decode.alias("bucket_lo"), "n"
    )
    if cumulative:
        w = (
            Window.partitionBy("query_id", "facet")
            .orderBy("bucket_lo")
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        out = out.select(
            "query_id", "facet", "bucket_lo", "n",
            F.sum("n").over(w).cast("long").alias("n_cumulative"),
        )
    return out


def _fused_scan_terms(plan: QueryPlan) -> set[str]:
    """Posting terms one query's evaluation touches — mirrors the
    term set _annotated_postings scans for a single query."""
    return (
        set(plan.required_posting_terms())
        | (set(plan.pos_terms) if plan.units is None else set())
        | set(plan.not_terms)
    )


def _search_many_fused(
    spark: SparkSession,
    store: IndexStore,
    idx_plans: list[tuple[int, QueryPlan]],
    top_k: int,
    prune: bool,
    boosts: dict[int, float],
    allowed: list[int] | None,
    avgdl: float,
    count_only: bool = False,
    count_facets_by_q: dict[int, dict] | None = None,
    facet_filters_by_q: dict[int, dict] | None = None,
    geo_by_q: dict[int, dict] | None = None,
    facet_sizes: dict[str, int] | None = None,
    dist_sort_by_q: dict[int, str] | None = None,
) -> DataFrame:
    """One scan + one exchange + one kernel for N queries (union /
    intersection / NOT / phrase / n-gram) → per-partition top-k
    candidates (query_id, docid, score); the caller takes the global
    per-query top-k. ``count_only`` emits per-partition (query_id,
    matches) tallies instead (pruning off — counts are exact).
    ``count_facets_by_q`` maps query_id → {facet: (kind, bounds)} and
    switches the kernel to per-query facet tallies (query_id, facet,
    code, matches), joining the blocks' facet arrays into the same
    single action."""
    terms = sorted({t for _i, p in idx_plans for t in _fused_scan_terms(p)})
    has_gram = any(NGRAM_SEP in t for t in terms)
    need_pos = any(p.qtype == "phrase" for _i, p in idx_plans)
    n_buckets = store.n_buckets
    buckets = sorted({term_bucket(t, n_buckets) for t in terms})
    cols = [
        "term", "field", "block_id", "max_tf", "min_dl_byte",
        "docids_vb", "tfs_vb", "dls",
    ]
    if has_gram:
        cols += [
            "tfs1_vb", "tfs2_vb", "tfs3_vb", "max_tf1", "max_tf2", "max_tf3",
        ]
    if need_pos:
        cols.append("positions_vb")
    postings = _cached_postings(spark, store).filter(
        F.col("tbucket").isin(buckets) & F.col("term").isin(terms)
    ).select(*cols)
    if need_pos:
        postings = postings.withColumnRenamed("positions_vb", "pos_vb")
    else:
        postings = postings.withColumn("pos_vb", F.lit(None).cast("binary"))
    if allowed is not None:
        postings = postings.filter(
            F.col("field").isin([int(i) for i in allowed])
        )
    geo_cols = set()
    for gf in (geo_by_q or {}).values():
        geo_cols |= (
            {gf["point"]} if "point" in gf else {gf["lat"], gf["lon"]}
        )
    count_cols: set[str] = set()
    for spec in (count_facets_by_q or {}).values():
        for fc, (kind, b) in spec.items():
            if kind == "geo":  # label, not a column: join its cols
                count_cols.update(c for c in b[2] if c is not None)
            else:
                count_cols.add(fc)
    facet_cols = sorted(
        count_cols
        | {
            fc
            for spec in (facet_filters_by_q or {}).values()
            for fc in spec
        }
        | geo_cols
    )
    # Query sharding: the per-(block, query) kernel work is Python
    # compute, and with few blocks the partition count caps the
    # parallelism (a 4-block index uses 4 of 32 cores for a 100-query
    # batch). Replicate the posting rows across ceil(cores / blocks)
    # shards and give each shard its qid-sliced subset of the batch —
    # every query still sees every block exactly once, so per-query
    # results are bit-identical; when the index has at least as many
    # blocks as cores the shard count is 1 and the plan is unchanged
    # (scale-adaptive, no duplication at scale). Facet/geo-joined
    # batches keep n_shards=1: their facet join reuses the block_id
    # partitioning.
    n_shards = 1
    if not facet_cols and len(idx_plans) > 1:
        par = spark.sparkContext.defaultParallelism
        bsz = int(store.meta.get("block_size", ROARING_BLOCK_SIZE))
        n_blocks_est = max(
            1, -(-int(store.meta.get("n_docs") or 1) // bsz)
        )
        # keep >= ~3 queries per shard: below that the extra task
        # dispatch + row duplication outweigh the parallel kernel
        # work (measured: a 9-query batch is fastest at 2-4 shards,
        # slower at 8)
        n_shards = max(
            1,
            min(len(idx_plans) // 3, -(-par // n_blocks_est)),
        )
    if n_shards > 1:
        rows = postings.withColumn(
            "shard",
            F.explode(F.expr(f"sequence(0, {n_shards - 1})")),
        ).repartition(
            min(
                spark.sparkContext.defaultParallelism,
                n_blocks_est * n_shards,
            ),
            "block_id",
            "shard",
        )
    else:
        rows = postings.withColumn("shard", F.lit(0)).repartition(
            "block_id"
        )
        if facet_cols:
            rows, _extra = _join_facet_blocks(
                spark, store, rows, facet_cols
            )
    rows = rows.sortWithinPartitions("shard", "block_id", "term", "field")
    kernel = _make_multi_kernel(
        idx_plans, top_k, prune and not count_only, avgdl, boosts,
        block_size=int(store.meta.get("block_size", ROARING_BLOCK_SIZE)),
        deletes=_load_delete_set(spark, store),
        has_gram=has_gram,
        count_only=count_only,
        count_facets_by_q=count_facets_by_q,
        facet_filters_by_q=facet_filters_by_q,
        geo_by_q=geo_by_q,
        facet_kinds={
            name: facet_kind(spec)
            for name, spec in (store.meta.get("facets") or {}).items()
        },
        facet_sizes=facet_sizes,
        dist_sort_by_q=dist_sort_by_q,
        n_shards=n_shards,
    )
    if count_facets_by_q:
        schema = "query_id int, " + FACET_COUNT_SCHEMA
    elif count_only:
        schema = "query_id int, matches long"
    else:
        schema = "query_id int, " + RESULT_SCHEMA + (
            ", geo_dist double" if dist_sort_by_q is not None else ""
        )
    return rows.mapInPandas(kernel, schema=schema)


def _overlay_bufs(buflist, kind: str, n_values: int):
    """Merge a block's facet buffers (one per committed/staged
    slice; non-missing slots disjoint) into one structure."""
    if buflist is None or len(buflist) == 0:
        return None
    if kind == "string_set":
        parts = [decode_string_set_block(b, n_values) for b in buflist]
        if len(parts) == 1:
            return parts[0]
        size = max(len(off) - 1 for off, _c in parts)
        counts = np.zeros(size, dtype=np.int64)
        per_doc: list[np.ndarray | None] = [None] * size
        for off, codes in parts:
            c = np.diff(off.astype(np.int64))
            for i in np.flatnonzero(c):
                per_doc[i] = codes[off[i] : off[i + 1]]
                counts[i] = c[i]
        offsets = np.zeros(size + 1, dtype=np.uint32)
        np.cumsum(counts, out=offsets[1:])
        flat = (
            np.concatenate([p for p in per_doc if p is not None])
            if counts.sum()
            else np.empty(0, dtype=facet_code_dtype(n_values))
        )
        return offsets, flat
    if kind == "string":
        dtype = facet_code_dtype(n_values)
        missing = facet_missing_code(n_values)
    elif kind == "morton":
        dtype = np.uint64  # packed Morton codes, 0 = missing
    else:
        dtype = np.float64
    arrs = [np.frombuffer(b, dtype=dtype) for b in buflist]
    if len(arrs) == 1:
        return arrs[0]
    size = max(len(a) for a in arrs)
    if kind == "string":
        out = np.full(size, missing, dtype=dtype)
        for a in arrs:
            m = a != missing
            out[: len(a)][m] = a[m]
    elif kind == "morton":
        out = np.zeros(size, dtype=np.uint64)
        for a in arrs:
            m = a != 0
            out[: len(a)][m] = a[m]
    else:
        out = np.full(size, np.nan, dtype=np.float64)
        for a in arrs:
            m = ~np.isnan(a)
            out[: len(a)][m] = a[m]
    return out


def _sset_gather(buf, cand: np.ndarray):
    """(owner idx into cand, codes) for the candidates' multi-value
    entries — vectorized CSR gather, no per-doc loop."""
    offsets, codes = buf
    n = len(offsets) - 1
    starts = np.where(cand < n, offsets[np.minimum(cand, n - 1)], 0)
    ends = np.where(cand < n, offsets[np.minimum(cand, n - 1) + 1], 0)
    counts = (ends - starts).astype(np.int64)
    total = int(counts.sum())
    if total == 0:
        return np.empty(0, np.int64), codes[:0]
    owner = np.repeat(np.arange(cand.size), counts)
    seg = np.concatenate(([0], np.cumsum(counts)[:-1]))
    within = np.arange(total) - np.repeat(seg, counts)
    flat = np.repeat(starts.astype(np.int64), counts) + within
    return owner, codes[flat]


def _make_multi_kernel(
    idx_plans: list[tuple[int, QueryPlan]],
    top_k: int,
    prune: bool,
    avgdl: float,
    boosts: dict[int, float],
    block_size: int = ROARING_BLOCK_SIZE,
    deletes: np.ndarray | None = None,
    has_gram: bool = False,
    count_only: bool = False,
    count_facets_by_q: dict[int, dict] | None = None,
    facet_filters_by_q: dict[int, dict] | None = None,
    geo_by_q: dict[int, dict] | None = None,
    facet_kinds: dict[str, str] | None = None,
    facet_sizes: dict[str, int] | None = None,
    dist_sort_by_q: dict[int, str] | None = None,
    n_shards: int = 1,
):
    """Batched kernel: decode each posting row ONCE, score every
    query against the shared decode. Per-query state (top-k heap,
    WAND threshold, candidate algebra, gram source map, phrase
    alignment) mirrors ``_make_kernel`` op-for-op so each query's
    results are bit-identical to its single-query run. ``count_only``
    tallies matches per query instead of scoring;
    ``count_facets_by_q`` additionally tallies facet-value counts per
    query from the blocks' facet arrays (one shared buffer decode per
    block, N queries' tallies against it). ``dist_sort_by_q`` marks
    queries whose per-partition top-k is kept by haversine distance
    (asc/desc, docid tiebreak) instead of score — score pruning is off
    for those (a non-score primary key invalidates the WAND
    threshold, as in the single-query emit-all path); when the dict is
    not None the output carries a ``geo_dist`` column (NaN for
    score-sorted queries)."""
    delete_set = deletes if deletes is not None else np.empty(0, dtype=np.int64)
    dist_sort = dist_sort_by_q or {}
    emit_dist_col = dist_sort_by_q is not None
    cfacets_by_q = {
        qi: dict(spec) for qi, spec in (count_facets_by_q or {}).items()
    }
    ffilters_by_q = {
        qi: list(spec.items())
        for qi, spec in (facet_filters_by_q or {}).items()
    }
    sizes = facet_sizes or {}
    # every facet buffer any query counts or filters on:
    # col → (kind, n_values)
    facet_buf_kinds: dict[str, tuple[str, int]] = {}
    for spec in cfacets_by_q.values():
        for name, (kind, _b) in spec.items():
            if kind == "geo":
                # _b = (bounds_km, mode, (col1, col2|None), lat0, lon0)
                _bk, gmode, gcols = _b[0], _b[1], _b[2]
                facet_buf_kinds[f"fb_{gcols[0]}"] = (
                    "numeric" if gmode == "pair" else gmode, 0
                )
                if gcols[1] is not None:
                    facet_buf_kinds[f"fb_{gcols[1]}"] = ("numeric", 0)
            else:
                facet_buf_kinds[f"fb_{name}"] = (kind, sizes.get(name, 0))
    for fspec in ffilters_by_q.values():
        for name, fs in fspec:
            facet_buf_kinds[f"fb_{name}"] = (fs[0], sizes.get(name, 0))
    # per-query geo configs: (mode, col, lon_col, lat0, lon0, radius)
    geo_cfg_by_q: dict[int, tuple] = {}
    for qi, gf in (geo_by_q or {}).items():
        if "point" in gf:
            mode = (facet_kinds or {}).get(gf["point"], "point")
            cols = (f"fb_{gf['point']}", None)
        else:
            mode = "pair"
            cols = (f"fb_{gf['lat']}", f"fb_{gf['lon']}")
        geo_cfg_by_q[qi] = (
            mode, cols[0], cols[1],
            float(gf["at"][0]), float(gf["at"][1]),
            float(gf["radius_km"]),
        )
        facet_buf_kinds[cols[0]] = (
            "numeric" if mode == "pair" else mode, 0
        )
        if cols[1] is not None:
            facet_buf_kinds[cols[1]] = ("numeric", 0)

    def _source_map(p: QueryPlan) -> dict[str, tuple[str, int | None]]:
        sm: dict[str, tuple[str, int | None]] = {}
        if p.units is not None:
            for u, _off in p.units:
                parts = p.unit_parts.get(u)
                if parts is None:
                    sm.setdefault(u, (u, None))
                else:
                    for k, part in enumerate(parts):
                        sm.setdefault(part, (u, k))
            for t in p.pos_terms:
                sm.setdefault(t, (t, None))
        else:
            sm = {t: (t, None) for t in p.pos_terms}
        return sm

    def _align(p: QueryPlan) -> list[tuple[str, int]]:
        if p.qtype == "phrase" and p.units is not None:
            return list(p.units)
        if p.qtype == "phrase":
            return list(p.phrase)
        return []

    qinfo = [
        (
            qi,
            p.qtype,
            dict(p.pos_terms),
            p.required_posting_terms(),
            set(p.not_terms),
            _source_map(p),
            _align(p),
            dict(p.unit_parts or {}),
            sorted(_fused_scan_terms(p) - set(p.not_terms)),
        )
        for qi, p in idx_plans
    ]
    # query → shard assignment (see _search_many_fused: each shard's
    # posting-row copies drive only that shard's queries)
    qinfo_by_shard: dict[int, list] = {s: [] for s in range(n_shards)}
    for entry in qinfo:
        qinfo_by_shard[entry[0] % n_shards].append(entry)
    decode_tab = _DECODE_NP.astype(np.float32)
    avgdl32 = np.float32(avgdl)
    # float64 upper-bound factors, identical math to the block_bound
    # column expression in _annotated_postings (format v3+: computed
    # at query time from current avgdl)
    dlq_tab = _DECODE_NP.astype(np.float64)

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
        best_d = {qi: np.empty(0, dtype=np.int64) for qi, *_ in qinfo}
        best_s = {qi: np.empty(0, dtype=np.float32) for qi, *_ in qinfo}
        best_g = {qi: np.empty(0, dtype=np.float64) for qi, *_ in qinfo}
        match_counts = dict.fromkeys((qi for qi, *_ in qinfo), 0)
        facet_tallies: dict[int, dict[str, np.ndarray]] = {
            qi: {
                fc: np.zeros(
                    sizes.get(fc, 0)
                    if kind in ("string", "string_set")
                    else len(bounds[0]) + 1
                    if kind == "geo"
                    else len(bounds) + 1,
                    dtype=np.int64,
                )
                for fc, (kind, bounds) in spec.items()
            }
            for qi, spec in cfacets_by_q.items()
        }

        def threshold(qi: int) -> float:
            if not prune or qi in dist_sort or len(best_s[qi]) < top_k:
                return -np.inf
            return float(best_s[qi].min())

        def merge_topk(qi: int, docids: np.ndarray, scores: np.ndarray) -> None:
            d = np.concatenate([best_d[qi], docids])
            s = np.concatenate([best_s[qi], scores])
            order = np.lexsort((d, -s.astype(np.float64)))[:top_k]
            best_d[qi], best_s[qi] = d[order], s[order]

        def merge_topk_dist(
            qi: int,
            docids: np.ndarray,
            scores: np.ndarray,
            dists: np.ndarray,
        ) -> None:
            d = np.concatenate([best_d[qi], docids])
            s = np.concatenate([best_s[qi], scores])
            g = np.concatenate([best_g[qi], dists])
            key = g if dist_sort[qi] == "asc" else -g
            order = np.lexsort((d, key))[:top_k]
            best_d[qi], best_s[qi], best_g[qi] = d[order], s[order], g[order]

        def process_block(rows: pd.DataFrame, qlist: list) -> None:
            block_id = int(rows["block_id"].iloc[0])
            base = block_id * block_size
            # one shared facet-buffer decode per block; every counting
            # query's tally reads the same arrays
            fbufs = (
                {
                    col: _overlay_bufs(rows[col].iloc[0], kind, nv)
                    for col, (kind, nv) in facet_buf_kinds.items()
                }
                if facet_buf_kinds
                else {}
            )

            def fbuf_at(col: str, idx: np.ndarray):
                fv = fbufs[col]
                if fv is None:
                    return None
                kind, nv = facet_buf_kinds[col]
                if idx.size and int(idx.max()) >= len(fv):
                    if kind == "string":
                        pad = np.full(
                            int(idx.max()) + 1,
                            facet_missing_code(nv),
                            dtype=facet_code_dtype(nv),
                        )
                    else:
                        pad = np.full(int(idx.max()) + 1, np.nan)
                    pad[: len(fv)] = fv
                    fv = pad
                return fv[idx]

            def latlon_of(gmode, c1, c2, c):
                """(lat, lon) at local docids ``c`` from pair /
                Point / packed-Morton storage; (None, None) when the
                block carries no buffer — same decode the single-query
                kernel uses."""
                if gmode == "point":
                    buf = fbufs[c1]
                    if buf is None:
                        return None, None
                    n_pts = len(buf) // 2
                    la = np.full(c.size, np.nan)
                    lo = np.full(c.size, np.nan)
                    ok = c < n_pts
                    la[ok] = buf[2 * c[ok]]
                    lo[ok] = buf[2 * c[ok] + 1]
                    return la, lo
                if gmode == "morton":
                    from seekstorm_spark.functions.geo import (
                        morton_decode,
                    )

                    buf = fbufs[c1]
                    if buf is None:
                        return None, None
                    codes = np.zeros(c.size, dtype=np.uint64)
                    ok = c < len(buf)
                    codes[ok] = buf[c[ok]]
                    la = np.full(c.size, np.nan)
                    lo = np.full(c.size, np.nan)
                    has = codes != 0
                    if has.any():
                        la[has], lo[has] = morton_decode(codes[has])
                    return la, lo
                return fbuf_at(c1, c), fbuf_at(c2, c)

            def hav_km(la, lo, lat0, lon0):
                a = (
                    np.sin(np.radians(lat0 - la) / 2.0) ** 2
                    + np.cos(np.radians(la))
                    * math.cos(math.radians(lat0))
                    * np.sin(np.radians(lon0 - lo) / 2.0) ** 2
                )
                return 2.0 * EARTH_RADIUS_KM * np.arcsin(np.sqrt(a))
            # shared per-block bound pieces: one f64 ub per posting row
            # (gram rows also carry per-partial-term ubs for the gram
            # bound = Σ parts' idf·comp_ub, as in _annotated_postings)
            row_ub: dict[str, list[tuple[int, float, float, list[float] | None]]] = {}
            raw = []
            for _, r in rows.iterrows():
                def comp_ub_of(tf: float) -> float:
                    mdlq = dlq_tab[int(r["min_dl_byte"])]
                    return (tf * (K + 1.0)) / (
                        tf + K * ((1.0 - B) + B * mdlq / float(avgdl))
                    )

                fld = int(r["field"])
                partial_ubs = None
                if has_gram and NGRAM_SEP in r["term"]:
                    n_parts = r["term"].count(NGRAM_SEP) + 1
                    partial_ubs = [
                        comp_ub_of(float(r[f"max_tf{k + 1}"]))
                        for k in range(n_parts)
                    ]
                row_ub.setdefault(r["term"], []).append(
                    (
                        fld,
                        float(boosts.get(fld, 1.0)),
                        comp_ub_of(float(r["max_tf"])),
                        partial_ubs,
                    )
                )
                raw.append(r)

            decoded: dict[str, list[dict]] = {}

            def recs_for(term: str) -> list[dict]:
                # decode lazily and ONCE per row, shared by all queries
                got = decoded.get(term)
                if got is None:
                    got = []
                    for r in raw:
                        if r["term"] != term:
                            continue
                        rec = {
                            "field": int(r["field"]),
                            "boost": float(boosts.get(int(r["field"]), 1.0)),
                            "d": decode_docids(r["docids_vb"]),
                            "tf": decode_tfs(r["tfs_vb"]),
                            "dl": np.frombuffer(r["dls"], dtype=np.uint8),
                            "pos_vb": r["pos_vb"],
                        }
                        if has_gram and NGRAM_SEP in term:
                            n_parts = term.count(NGRAM_SEP) + 1
                            rec["partials"] = [
                                decode_tfs(r[f"tfs{k + 1}_vb"])
                                for k in range(n_parts)
                            ]
                        got.append(rec)
                    decoded[term] = got
                return got

            union_cache: dict[str, np.ndarray] = {}

            def union_docs(term: str) -> np.ndarray:
                got = union_cache.get(term)
                if got is None:
                    ds = [rec["d"] for rec in recs_for(term)]
                    got = ds[0] if len(ds) == 1 else np.unique(np.concatenate(ds))
                    union_cache[term] = got
                return got

            class _LazyRecs(dict):
                """dict view over recs_for for _phrase_filter."""

                def __contains__(self, term):
                    return term in row_ub

                def __getitem__(self, term):
                    return recs_for(term)

            lazy_recs = _LazyRecs()

            present = set(row_ub)
            for (qi, qtype, pos_terms, required_terms, not_set,
                 source_map, align, unit_parts_q, bound_terms) in qlist:
                if qtype in ("intersection", "phrase", "ngram"):
                    if any(t not in present for t in required_terms):
                        continue
                    q_present = required_terms
                else:
                    q_present = [t for t in required_terms if t in present]
                    if not q_present:
                        continue
                if prune:
                    bound = 0.0
                    for t in bound_terms:
                        if t not in present:
                            continue
                        parts = unit_parts_q.get(t)
                        for _fld, boost, comp_ub, partial_ubs in row_ub[t]:
                            if parts is not None and partial_ubs is not None:
                                g = 0.0
                                for k, part in enumerate(parts):
                                    g += float(
                                        pos_terms.get(part, 0.0)
                                    ) * partial_ubs[k]
                                bound += boost * g
                            elif t in pos_terms:
                                bound += boost * (pos_terms[t] * comp_ub)
                    thr = threshold(qi)
                    eps = 1e-6 + 1e-5 * abs(thr) if np.isfinite(thr) else 0.0
                    if bound < thr - eps:
                        continue
                if qtype in ("intersection", "phrase", "ngram"):
                    cand = union_docs(required_terms[0])
                    for t in required_terms[1:]:
                        cand = np.intersect1d(
                            cand, union_docs(t), assume_unique=True
                        )
                        if cand.size == 0:
                            break
                    if cand.size == 0:
                        continue
                else:
                    cand = (
                        union_docs(q_present[0])
                        if len(q_present) == 1
                        else np.unique(
                            np.concatenate([union_docs(t) for t in q_present])
                        )
                    )
                for t in not_set:
                    if t in present:
                        cand = cand[
                            ~np.isin(cand, union_docs(t), assume_unique=True)
                        ]
                if cand.size == 0:
                    continue
                if delete_set.size:
                    cand = cand[
                        ~np.isin(base + cand, delete_set, assume_unique=True)
                    ]
                    if cand.size == 0:
                        continue
                # per-query facet filters over the SHARED buffer decode
                # (candidate-subset filtering keeps the block bound
                # admissible, as in the single-query kernel)
                for fname, fspec in ffilters_by_q.get(qi, ()):
                    if fspec[0] == "string_set":
                        buf = fbufs[f"fb_{fname}"]
                        if buf is None:
                            cand = cand[:0]
                            break
                        owner, codes = _sset_gather(buf, cand)
                        hit = np.isin(codes, fspec[1])
                        keep = np.zeros(cand.size, dtype=bool)
                        keep[owner[hit]] = True
                        cand = cand[keep]
                    else:
                        vals = fbuf_at(f"fb_{fname}", cand)
                        if vals is None:
                            cand = cand[:0]
                        elif fspec[0] == "numeric":
                            cand = cand[
                                (vals >= fspec[1]) & (vals <= fspec[2])
                            ]
                        else:
                            cand = cand[np.isin(vals, fspec[1])]
                    if cand.size == 0:
                        break
                if cand.size == 0:
                    continue
                # per-query geo radius over the shared buffers (same
                # haversine op order as the single-query kernel)
                gcfg = geo_cfg_by_q.get(qi)
                if gcfg is not None:
                    gmode = gcfg[0]
                    if gmode == "point":
                        buf = fbufs[gcfg[1]]
                        if buf is None:
                            continue
                        n_pts = len(buf) // 2
                        lat = np.full(cand.size, np.nan)
                        lon = np.full(cand.size, np.nan)
                        ok = cand < n_pts
                        lat[ok] = buf[2 * cand[ok]]
                        lon[ok] = buf[2 * cand[ok] + 1]
                    elif gmode == "morton":
                        from seekstorm_spark.functions.geo import (
                            morton_decode,
                        )

                        buf = fbufs[gcfg[1]]
                        if buf is None:
                            continue
                        codes = np.zeros(cand.size, dtype=np.uint64)
                        ok = cand < len(buf)
                        codes[ok] = buf[cand[ok]]
                        lat = np.full(cand.size, np.nan)
                        lon = np.full(cand.size, np.nan)
                        has = codes != 0
                        if has.any():
                            lat[has], lon[has] = morton_decode(codes[has])
                    else:
                        lat = fbuf_at(gcfg[1], cand)
                        lon = fbuf_at(gcfg[2], cand)
                        if lat is None or lon is None:
                            continue
                    lat0, lon0, radius = gcfg[3], gcfg[4], gcfg[5]
                    a = (
                        np.sin(np.radians(lat0 - lat) / 2.0) ** 2
                        + np.cos(np.radians(lat))
                        * math.cos(math.radians(lat0))
                        * np.sin(np.radians(lon0 - lon) / 2.0) ** 2
                    )
                    d_km = 2.0 * EARTH_RADIUS_KM * np.arcsin(np.sqrt(a))
                    gkeep = ~np.isnan(d_km) & (d_km <= radius)
                    cand = cand[gkeep]
                    dists = d_km[gkeep] if qi in dist_sort else None
                    if cand.size == 0:
                        continue
                else:
                    dists = None
                if align and len(align) > 1:
                    keep = _phrase_filter(lazy_recs, cand, align)
                    cand = cand[keep]
                    if dists is not None:
                        dists = dists[keep]
                    if cand.size == 0:
                        continue
                if count_only:
                    match_counts[qi] += int(cand.size)
                    for fc, (kind, bounds) in cfacets_by_q.get(
                        qi, {}
                    ).items():
                        nv = sizes.get(fc, 0)
                        if kind == "geo":
                            gb, gmode, gcols, glat, glon = bounds
                            la, lo = latlon_of(
                                gmode,
                                f"fb_{gcols[0]}",
                                f"fb_{gcols[1]}"
                                if gcols[1] is not None
                                else None,
                                cand,
                            )
                            if la is None or lo is None:
                                continue
                            gd = hav_km(la, lo, glat, glon)
                            gok = ~np.isnan(gd) & (gd >= gb[0])
                            gbins = (
                                np.searchsorted(gb, gd[gok], side="right")
                                - 1
                            )
                            facet_tallies[qi][fc] += np.bincount(
                                gbins, minlength=len(gb) + 1
                            )
                            continue
                        if kind == "string_set":
                            buf = fbufs[f"fb_{fc}"]
                            if buf is None:
                                continue
                            _owner, codes = _sset_gather(buf, cand)
                            facet_tallies[qi][fc] += np.bincount(
                                codes.astype(np.int64), minlength=nv
                            )[:nv]
                            continue
                        fv = fbuf_at(f"fb_{fc}", cand)
                        if fv is None:
                            continue
                        if kind == "string":
                            valid = fv < nv
                            facet_tallies[qi][fc] += np.bincount(
                                fv[valid].astype(np.int64), minlength=nv
                            )[:nv]
                        else:
                            ok = ~np.isnan(fv) & (fv >= bounds[0])
                            bins = (
                                np.searchsorted(bounds, fv[ok], side="right")
                                - 1
                            )
                            facet_tallies[qi][fc] += np.bincount(
                                bins, minlength=len(bounds) + 1
                            )
                    continue
                # f32 accumulation in (term asc, field asc) order over
                # ORIGINAL terms — identical to _make_kernel's entries
                # loop (gram partials score their source terms)
                entries = []
                for orig in pos_terms:
                    pterm, pidx = source_map.get(orig, (orig, None))
                    for rec in recs_for(pterm) if pterm in present else []:
                        tfs = (
                            rec["tf"] if pidx is None
                            else rec["partials"][pidx]
                        )
                        entries.append(
                            (orig, rec["field"], rec["boost"], rec["d"],
                             tfs, rec["dl"])
                        )
                entries.sort(key=lambda e: (e[0], e[1]))
                scores = np.zeros(cand.size, dtype=np.float32)
                for t, _fld, boost, d, tf, dl in entries:
                    idx = np.searchsorted(d, cand)
                    valid = (idx < d.size) & (
                        d[np.minimum(idx, d.size - 1)] == cand
                    )
                    ii = idx[valid]
                    scores[valid] += np.float32(boost) * term_scores(
                        pos_terms[t], tf[ii], dl[ii]
                    )
                if qi in dist_sort and dists is not None:
                    merge_topk_dist(qi, base + cand, scores, dists)
                else:
                    merge_topk(qi, base + cand, scores)

        pending: list[pd.DataFrame] = []
        pending_key = None
        for pdf in batches:
            if pdf.empty:
                continue
            for key2, grp in pdf.groupby(["shard", "block_id"], sort=False):
                if pending_key is not None and key2 != pending_key:
                    process_block(
                        pd.concat(pending),
                        qinfo_by_shard.get(int(pending_key[0]), ()),
                    )
                    pending = []
                pending_key = key2
                pending.append(grp)
        if pending:
            process_block(
                pd.concat(pending),
                qinfo_by_shard.get(int(pending_key[0]), ()),
            )

        if cfacets_by_q:
            out_q: list[int] = []
            out_f: list[str] = []
            out_c: list[int] = []
            out_n: list[int] = []
            for qi, tallies in facet_tallies.items():
                for fc, tally in tallies.items():
                    for code in np.flatnonzero(tally):
                        out_q.append(qi)
                        out_f.append(fc)
                        out_c.append(int(code))
                        out_n.append(int(tally[code]))
            yield pd.DataFrame(
                {
                    "query_id": pd.Series(out_q, dtype="int32"),
                    "facet": pd.Series(out_f, dtype="object"),
                    "code": pd.Series(out_c, dtype="int64"),
                    "matches": pd.Series(out_n, dtype="int64"),
                }
            )
            return
        if count_only:
            yield pd.DataFrame(
                {
                    "query_id": pd.Series(
                        list(match_counts.keys()), dtype="int32"
                    ),
                    "matches": pd.Series(
                        list(match_counts.values()), dtype="int64"
                    ),
                }
            )
            return

        qids = []
        ds = []
        ss = []
        gs = []
        for qi, *_ in qinfo:
            qids.append(np.full(best_d[qi].size, qi, dtype=np.int32))
            ds.append(best_d[qi])
            ss.append(best_s[qi])
            gs.append(
                best_g[qi]
                if qi in dist_sort
                else np.full(best_d[qi].size, np.nan)
            )
        out = {
            "query_id": pd.Series(
                np.concatenate(qids) if qids else np.empty(0, np.int32),
                dtype="int32",
            ),
            "docid": pd.Series(
                np.concatenate(ds) if ds else np.empty(0, np.int64),
                dtype="int64",
            ),
            "score": pd.Series(
                np.concatenate(ss) if ss else np.empty(0, np.float32),
                dtype="float32",
            ),
        }
        if emit_dist_col:
            out["geo_dist"] = pd.Series(
                np.concatenate(gs) if gs else np.empty(0, np.float64),
                dtype="float64",
            )
        yield pd.DataFrame(out)

    return kernel


def count_matches(
    spark: SparkSession,
    store: IndexStore,
    query: str,
    default_type: str = "union",
    field_filter: list[str] | None = None,
    staged: list | None = None,
    facet_filters: dict | None = None,
    geo_filter: dict | None = None,
) -> int:
    """Exact match count (ResultType::Count, reference search.rs:168-176),
    optionally restricted by the same ``facet_filters`` / ``geo_filter``
    predicates ``search`` takes (the reference counts within filters too).

    Single positive term without NOT/phrase/filters short-circuits to
    the stored df (reference single.rs:313-323) — no scan at all. The
    df probe already sums staged partials, so the shortcut stays valid
    for realtime level-0 counts.
    """
    staged = list(staged) if staged else None
    geo_filter, _unit = _normalize_geo(geo_filter)
    filters_k, _emit, dicts, kinds = _resolve_facets(
        store, facet_filters, None, geo_filter
    )
    plan = _plan(spark, store, query, default_type, staged)
    if plan.missing_required or not plan.pos_terms:
        return 0
    import os

    has_deletes = os.path.exists(store.deletes_path)
    filtered = bool(filters_k) or geo_filter is not None
    if (
        len(plan.pos_terms) == 1
        and not plan.not_terms
        and plan.qtype != "phrase"
        and plan.qtype != "ngram"
        and field_filter is None  # stored df counts matches in ANY field
        and not has_deletes  # stored df doesn't reflect the delete set
        and not filtered  # predicates need the per-block facet arrays
    ):
        # zero Spark jobs: the stored df IS the count (single.rs:313-323)
        term = next(iter(plan.pos_terms))
        return int(_probe_term_stats(store, [term], staged).get(term, 0))
    if (
        plan.qtype == "ngram" and field_filter is None and not has_deletes
        and not filtered
    ):
        # the covering gram's stored df IS the phrase match count
        gram = plan.units[0][0]
        return int(_probe_term_stats(store, [gram], staged).get(gram, 0))

    boosts, allowed = _resolve_fields(store, None, field_filter)
    _n, avgdl = _effective_stats(store, staged)
    need_facets = sorted(set(filters_k))
    block_bounds = None
    if geo_filter:
        geo_cols = (
            {geo_filter["point"]}
            if "point" in geo_filter
            else {geo_filter["lat"], geo_filter["lon"]}
        )
        need_facets = sorted(set(need_facets) | geo_cols)
        from seekstorm_spark.functions.geo import geo_boxes_for_radius

        boxes = geo_boxes_for_radius(
            float(geo_filter["at"][0]), float(geo_filter["at"][1]),
            float(geo_filter["radius_km"]),
        )
        if "point" in geo_filter:
            block_bounds = {
                geo_filter["point"]: [(b[0], b[1]) for b in boxes],
            }
        else:
            block_bounds = {
                geo_filter["lat"]: [(b[0], b[1]) for b in boxes],
                geo_filter["lon"]: [(b[2], b[3]) for b in boxes],
            }
    for fname, spec in (filters_k or {}).items():
        if spec[0] == "numeric":
            block_bounds = block_bounds or {}
            block_bounds.setdefault(fname, []).append(
                (float(spec[1]), float(spec[2]))
            )
    rows = _annotated_postings(
        spark, store, plan, boosts, allowed,
        facet_cols=need_facets or None, staged=staged, avgdl=avgdl,
        block_bounds=block_bounds,
    )
    kernel = _make_kernel(
        plan, 0, False, avgdl, count_only=True,
        block_size=int(store.meta.get('block_size', ROARING_BLOCK_SIZE)),
        deletes=_load_delete_set(spark, store),
        facet_filters_k=filters_k,
        facet_kinds=kinds,
        facet_sizes={n: len(v) for n, v in dicts.items() if v is not None},
        geo=geo_filter,
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


def facet_counts(
    spark: SparkSession,
    store: IndexStore,
    query: str,
    facets: list[str],
    default_type: str = "union",
    staged: list | None = None,
    prefix: dict[str, str] | None = None,
    length: int | dict[str, int] | None = None,
) -> DataFrame:
    """String-facet value counts over ALL matching docs, computed
    INSIDE the pruned postings scan (the reference counts facets
    during result collection, add_result.rs:487-646) →
    DataFrame(facet, value, n).

    ``prefix`` / ``length`` mirror the reference QueryFacet options
    (search.rs:335-369: "Prefix filter of facet values to return" +
    "maximum number of facet values to return" — a type-ahead aid
    when a facet has too many distinct values): ``prefix`` maps a
    facet to the value prefix it must keep; ``length`` caps each
    facet's returned values to its top-N by (count desc, value asc).
    Both filter what RETURNS — counts per value are unchanged."""
    out = _facet_count_run(
        spark, store, query, default_type, staged,
        string_facets=facets, range_facets=None,
    )
    for fc, p in (prefix or {}).items():
        out = out.filter(
            (F.col("facet") != fc) | F.col("value").startswith(p)
        )
    if length is not None:
        caps = (
            {fc: int(length) for fc in facets}
            if isinstance(length, int)
            else {fc: int(n) for fc, n in length.items()}
        )
        w = Window.partitionBy("facet").orderBy(
            F.col("n").desc(), F.col("value").asc()
        )
        ranked = out.withColumn("_rk", F.row_number().over(w))
        cap_expr = None
        for fc, n in caps.items():
            c = (F.col("facet") == fc) & (F.col("_rk") <= n)
            cap_expr = c if cap_expr is None else (cap_expr | c)
        cap_expr = cap_expr | ~F.col("facet").isin(list(caps))
        out = ranked.filter(cap_expr).drop("_rk")
    return out


def facet_range_counts(
    spark: SparkSession,
    store: IndexStore,
    query: str,
    ranges: dict[str, list[float]],
    default_type: str = "union",
    staged: list | None = None,
    cumulative: bool = False,
) -> DataFrame:
    """Numeric range-facet counts over ALL matching docs (reference
    RangeType facets + CountWithinRange cumulative sums,
    search.rs:3598-3764) → DataFrame(facet, bucket_lo, n[,
    n_cumulative]). ``ranges`` maps facet → ascending LOWER bounds;
    the last bucket is open-ended."""
    out = _facet_count_run(
        spark, store, query, default_type, staged,
        string_facets=None, range_facets=ranges,
    )
    if cumulative:
        w = (
            Window.partitionBy("facet")
            .orderBy("bucket_lo")
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        out = out.select(
            "facet", "bucket_lo", "n",
            F.sum("n").over(w).cast("long").alias("n_cumulative"),
        )
    return out


def geo_range_counts(
    spark: SparkSession,
    store: IndexStore,
    query: str,
    base: tuple[float, float],
    ranges: list[float],
    facet: str | None = None,
    lat: str | None = None,
    lon: str | None = None,
    unit: str = "km",
    default_type: str = "union",
    staged: list | None = None,
    cumulative: bool = False,
) -> DataFrame:
    """Distance-bucket facet counts from ``base`` over ALL matching
    docs (reference QueryFacet::Point / Ranges::Point with
    DistanceUnit, search.rs:330-420 — "distance between base of type
    Point and facet field of type Point"), computed INSIDE the pruned
    scan like every other facet tally. ``ranges`` = ascending lower
    bucket bounds in ``unit`` ("km" | "mi"); docs nearer than the
    first bound are uncounted, the last bucket is open-ended;
    ``cumulative`` adds the CountWithinRange running sum. The facet is
    a Point/packed-Morton column (``facet=``) or a split lat/lon pair
    (``lat=``/``lon=``); distances use the identical haversine the
    geo filter and geo_dist sort use, so the three agree to the bit.
    → DataFrame(facet, bucket_lo, n[, n_cumulative]); bucket_lo in
    ``unit``."""
    from seekstorm_spark.functions.geo import KM_PER_MILE

    if unit not in ("km", "mi"):
        raise ValueError(f"unit must be 'km' or 'mi', got {unit!r}")
    specs: dict = store.meta.get("facets") or {}
    out_bounds = [float(b) for b in sorted(ranges)]
    scale = KM_PER_MILE if unit == "mi" else 1.0
    bounds_km = [b * scale for b in out_bounds]
    if facet is not None:
        kind = facet_kind(specs[facet]) if facet in specs else None
        if kind not in ("point", "morton"):
            raise ValueError(
                f"{facet!r} is not an indexed Point/Morton facet"
            )
        label, mode, cols = facet, kind, [facet]
    else:
        if lat is None or lon is None:
            raise ValueError("give facet= or both lat= and lon=")
        for c in (lat, lon):
            if c not in specs or facet_kind(specs[c]) != "numeric":
                raise ValueError(f"{c!r} is not an indexed numeric facet")
        label, mode, cols = f"{lat},{lon}", "pair", [lat, lon]
    out = _facet_count_run(
        spark, store, query, default_type, staged,
        string_facets=None, range_facets=None,
        geo_facets={
            label: (mode, cols, base[0], base[1], bounds_km, out_bounds)
        },
    )
    if cumulative:
        w = (
            Window.partitionBy("facet")
            .orderBy("bucket_lo")
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        out = out.select(
            "facet", "bucket_lo", "n",
            F.sum("n").over(w).cast("long").alias("n_cumulative"),
        )
    return out


def geo_range_counts_many(
    spark: SparkSession,
    store: IndexStore,
    requests: list[tuple[str, dict]],
    default_type: str = "union",
    staged: list | None = None,
) -> DataFrame:
    """Geo distance-bucket counts for N queries in ONE Spark action
    → DataFrame(query_id, facet, bucket_lo, n). ``requests`` =
    [(query, spec)] with spec = {"base": (lat, lon), "ranges": [...],
    "facet": point_col | ("lat": .., "lon": ..), "unit": "km"|"mi"} —
    per-query bases/buckets/units may differ. Same fused scan +
    shared per-block buffer decode as :func:`facet_counts_many`;
    per-query ≡ :func:`geo_range_counts`. ``staged`` falls back per
    query."""
    from functools import reduce

    from seekstorm_spark.functions.geo import KM_PER_MILE

    staged = list(staged) if staged else None
    specs: dict = store.meta.get("facets") or {}
    empty = spark.createDataFrame(
        [], "query_id int, facet string, bucket_lo double, n long"
    )

    def _norm_req(spec: dict):
        unit = spec.get("unit", "km")
        if unit not in ("km", "mi"):
            raise ValueError(f"unit must be 'km' or 'mi', got {unit!r}")
        out_bounds = [float(b) for b in sorted(spec["ranges"])]
        scale = KM_PER_MILE if unit == "mi" else 1.0
        bounds_km = np.asarray(
            [b * scale for b in out_bounds], dtype=np.float64
        )
        if "facet" in spec:
            fc = spec["facet"]
            kind = facet_kind(specs[fc]) if fc in specs else None
            if kind not in ("point", "morton"):
                raise ValueError(
                    f"{fc!r} is not an indexed Point/Morton facet"
                )
            label, mode, cols = fc, kind, (fc, None)
        else:
            la, lo = spec["lat"], spec["lon"]
            for c in (la, lo):
                if c not in specs or facet_kind(specs[c]) != "numeric":
                    raise ValueError(
                        f"{c!r} is not an indexed numeric facet"
                    )
            label, mode, cols = f"{la},{lo}", "pair", (la, lo)
        base = spec["base"]
        return label, (
            bounds_km, mode, cols, float(base[0]), float(base[1])
        ), out_bounds

    if staged:
        outs = []
        for i, (qstr, spec) in enumerate(requests):
            kwargs = (
                {"facet": spec["facet"]}
                if "facet" in spec
                else {"lat": spec["lat"], "lon": spec["lon"]}
            )
            outs.append(
                geo_range_counts(
                    spark, store, qstr, spec["base"], spec["ranges"],
                    unit=spec.get("unit", "km"),
                    default_type=default_type, staged=staged, **kwargs,
                ).select(F.lit(int(i)).alias("query_id"), "*")
            )
        return reduce(lambda a, b: a.unionByName(b), outs) if outs else empty

    plans = [
        _plan(spark, store, qstr, default_type, None)
        for qstr, _s in requests
    ]
    boosts, allowed = _resolve_fields(store, None, None)
    _n, avgdl = _effective_stats(store, None)
    fused: list[tuple[int, QueryPlan]] = []
    count_facets_by_q: dict[int, dict] = {}
    bounds_by_qf: dict[tuple[int, str], list[float]] = {}
    for i, plan in enumerate(plans):
        if plan.missing_required or not plan.pos_terms:
            continue
        fused.append((i, plan))
        label, gspec, out_bounds = _norm_req(requests[i][1])
        count_facets_by_q[i] = {label: ("geo", gspec)}
        bounds_by_qf[(i, label)] = out_bounds
    if not fused:
        return empty
    agg = (
        _search_many_fused(
            spark, store, fused, 0, False, boosts, allowed, avgdl,
            count_only=True,
            count_facets_by_q=count_facets_by_q,
            facet_sizes={},
        )
        .groupBy("query_id", "facet", "code")
        .agg(F.sum("matches").cast("long").alias("n"))
    )
    decode = F.lit(None).cast("double")
    for (qi, fc), bs in bounds_by_qf.items():
        arr = double_array(bs)
        decode = F.when(
            (F.col("query_id") == qi) & (F.col("facet") == fc),
            F.element_at(arr, F.col("code").cast("int") + 1),
        ).otherwise(decode)
    return agg.select(
        "query_id", "facet", decode.alias("bucket_lo"), "n"
    )


def _facet_count_run(
    spark: SparkSession,
    store: IndexStore,
    query: str,
    default_type: str,
    staged: list | None,
    string_facets: list[str] | None,
    range_facets: dict[str, list[float]] | None,
    geo_facets: dict | None = None,
) -> DataFrame:
    staged = list(staged) if staged else None
    specs: dict = store.meta.get("facets") or {}
    count_spec: dict = {}
    fsizes: dict[str, int] = {}
    for fc in string_facets or []:
        vals = facet_values(specs[fc]) if fc in specs else None
        if fc not in specs or vals is None:
            raise ValueError(f"{fc!r} is not an indexed string facet")
        count_spec[fc] = (facet_kind(specs[fc]), None)
        fsizes[fc] = len(vals)
    for fc, bounds in (range_facets or {}).items():
        if fc not in specs or facet_kind(specs[fc]) != "numeric":
            raise ValueError(f"{fc!r} is not an indexed numeric facet")
        count_spec[fc] = ("numeric", np.asarray(sorted(bounds), dtype=np.float64))
    # geo distance buckets: label -> (mode, cols, lat0, lon0,
    # bounds_km, out_bounds) — bucketed in km inside the kernel,
    # decoded to the CALLER's unit bounds
    kernel_geo: dict = {}
    geo_out_bounds: dict[str, np.ndarray] = {}
    geo_join_cols: list[str] = []
    for label, (mode, cols, lat0, lon0, bounds_km, out_bounds) in (
        geo_facets or {}
    ).items():
        kernel_geo[label] = (
            np.asarray(bounds_km, dtype=np.float64),
            mode,
            f"fb_{cols[0]}",
            f"fb_{cols[1]}" if len(cols) > 1 else None,
            float(lat0),
            float(lon0),
        )
        geo_out_bounds[label] = np.asarray(out_bounds, dtype=np.float64)
        geo_join_cols.extend(c for c in cols if c not in geo_join_cols)

    plan = _plan(spark, store, query, default_type, staged)
    if string_facets:
        empty = spark.createDataFrame([], "facet string, value string, n long")
    else:
        empty = spark.createDataFrame([], "facet string, bucket_lo double, n long")
    if plan.missing_required or not plan.pos_terms:
        return empty

    boosts, allowed = _resolve_fields(store, None, None)
    _n, avgdl = _effective_stats(store, staged)
    rows = _annotated_postings(
        spark, store, plan, boosts, allowed,
        facet_cols=sorted(count_spec) + geo_join_cols,
        staged=staged, avgdl=avgdl,
    )
    kernel = _make_kernel(
        plan, 0, False, avgdl, count_only=True,
        block_size=int(store.meta.get('block_size', ROARING_BLOCK_SIZE)),
        deletes=_load_delete_set(spark, store),
        count_facets=count_spec,
        count_geo=kernel_geo or None,
        facet_sizes=fsizes,
    )
    agg = (
        rows.sortWithinPartitions(
            F.col("block_bound").desc(), "block_id", "term", "field"
        )
        .mapInPandas(kernel, schema=FACET_COUNT_SCHEMA)
        .groupBy("facet", "code")
        .agg(F.sum("matches").cast("long").alias("n"))
    )
    if string_facets:
        decoded = _decode_string_codes(
            spark, agg,
            {fc: facet_values(specs[fc]) for fc in string_facets},
            out_col="value",
        )
        return decoded.select("facet", "value", "n")
    bounds_arr = None
    decode_bounds = {
        fc: bounds for fc, (_k, bounds) in count_spec.items()
    }
    decode_bounds.update(geo_out_bounds)
    for fc, bounds in decode_bounds.items():
        arr = double_array(bounds)
        expr = F.element_at(arr, F.col("code").cast("int") + 1)
        bounds_arr = (
            expr
            if bounds_arr is None
            else F.when(F.col("facet") == fc, expr).otherwise(bounds_arr)
        )
    return agg.select("facet", bounds_arr.alias("bucket_lo"), "n")


def index_facet_stats(
    spark: SparkSession,
    store: IndexStore,
    facets: list[str],
) -> DataFrame:
    """Index-level facet value counts over ALL live docs → DataFrame
    (facet, value, n) — the reference's get_index_string_facets
    (index.rs:4407-4458) without any query: one scan of the per-block
    facet arrays (no postings touched), each block's buffers overlay
    + bincount in a bounded task, deletes excluded."""
    specs: dict = store.meta.get("facets") or {}
    for fc in facets:
        vals = facet_values(specs[fc]) if fc in specs else None
        if fc not in specs or vals is None:
            raise ValueError(f"{fc!r} is not an indexed string facet")
    kinds = {fc: facet_kind(specs[fc]) for fc in facets}
    sizes = {fc: len(facet_values(specs[fc])) for fc in facets}
    block_size = int(store.meta.get("block_size", ROARING_BLOCK_SIZE))
    delete_set = _load_delete_set(spark, store)

    rows = (
        store.facet_blocks(spark)
        .filter(F.col("facet").isin(list(facets)))
        .groupBy("facet", "block_id")
        .agg(F.collect_list("fvalues").alias("bufs"))
    )

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        tallies = {fc: np.zeros(sizes[fc], dtype=np.int64) for fc in facets}
        for pdf in batches:
            for _, r in pdf.iterrows():
                fc = r["facet"]
                kind = kinds[fc]
                buf = _overlay_bufs(r["bufs"], kind, sizes[fc])
                if buf is None:
                    continue
                base = int(r["block_id"]) * block_size
                if kind == "string_set":
                    offsets, codes = buf
                    n = len(offsets) - 1
                    keep = np.ones(n, dtype=bool)
                    if delete_set.size:
                        keep &= ~np.isin(
                            base + np.arange(n), delete_set,
                            assume_unique=True,
                        )
                    owner = np.repeat(
                        np.arange(n), np.diff(offsets.astype(np.int64))
                    )
                    sel = codes[keep[owner]]
                    tallies[fc] += np.bincount(
                        sel.astype(np.int64), minlength=sizes[fc]
                    )[: sizes[fc]]
                else:
                    valid = buf < sizes[fc]  # missing sentinel out
                    if delete_set.size:
                        valid &= ~np.isin(
                            base + np.arange(len(buf)), delete_set,
                            assume_unique=True,
                        )
                    tallies[fc] += np.bincount(
                        buf[valid].astype(np.int64), minlength=sizes[fc]
                    )[: sizes[fc]]
        out_f, out_c, out_n = [], [], []
        for fc, t in tallies.items():
            for code in np.flatnonzero(t):
                out_f.append(fc)
                out_c.append(int(code))
                out_n.append(int(t[code]))
        yield pd.DataFrame(
            {
                "facet": pd.Series(out_f, dtype="object"),
                "code": pd.Series(out_c, dtype="int64"),
                "matches": pd.Series(out_n, dtype="int64"),
            }
        )

    agg = (
        rows.mapInPandas(kernel, schema=FACET_COUNT_SCHEMA)
        .groupBy("facet", "code")
        .agg(F.sum("matches").cast("long").alias("n"))
    )
    decoded = _decode_string_codes(
        spark, agg, {fc: facet_values(specs[fc]) for fc in set(facets)},
        out_col="value",
    )
    return decoded.select("facet", "value", "n")


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


def iterate_docids(
    spark: SparkSession,
    store: IndexStore,
    document_id: int | None = None,
    skip: int = 0,
    take: int = 10,
    include_deleted: bool = False,
) -> tuple[int, list[int]]:
    """The reference's document iterator (``get_iterator``,
    api_endpoints.rs:1054-1146): sequential access to every live
    docid without running a search.

    * ``document_id=None, take>0`` — skip the FIRST ``skip`` ids,
      take the next ``take``.
    * ``document_id=None, take<0`` — skip the LAST ``skip`` ids,
      take the previous ``|take|``.
    * ``document_id=i, take>0`` — ids strictly AFTER ``i``: skip
      ``skip``, take ``take`` (next page: skip=1, take=+page).
    * ``document_id=i, take<0`` — ids strictly BEFORE ``i``,
      walking backward: skip ``skip``, take ``|take|`` (previous
      page: skip=1, take=-page).

    Returns ``(actually_skipped, docids ascending)`` — fewer ids than
    requested, or ``actually_skipped < skip``, signals the index
    boundary, exactly the reference's end/begin detection contract.
    One bounded job: the scan collects ``skip + |take|`` ids via
    TakeOrdered (no global materialization)."""
    if take == 0:
        return 0, []
    forward = take > 0
    t = abs(int(take))
    dm = store.doc_meta(spark).filter(F.col("field") == 0).select("docid")
    if not include_deleted:
        dm = _anti_join_deletes(spark, store, dm)
    if document_id is not None:
        dm = dm.filter(
            F.col("docid") > int(document_id)
            if forward
            else F.col("docid") < int(document_id)
        )
    order = F.col("docid").asc() if forward else F.col("docid").desc()
    ids = [
        r["docid"] for r in dm.orderBy(order).limit(int(skip) + t).collect()
    ]
    skipped = min(int(skip), len(ids))
    return skipped, sorted(ids[skipped : skipped + t])


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
    invalidate_term_stats_cache(store.path)


def match_docids(
    spark: SparkSession,
    store: IndexStore,
    query: str,
    default_type: str = "union",
    staged: list | None = None,
) -> DataFrame:
    """ALL matching docids as a DataFrame (no top-k, no sort) — the
    distributed primitive behind delete-by-query and bulk exports.
    Runs the kernel in emit-all mode with pruning off."""
    staged = list(staged) if staged else None
    plan = _plan(spark, store, query, default_type, staged)
    if plan.missing_required or not plan.pos_terms:
        return spark.createDataFrame([], "docid long")
    boosts, allowed = _resolve_fields(store, None, None)
    _n, avgdl = _effective_stats(store, staged)
    rows = _annotated_postings(
        spark, store, plan, boosts, allowed, staged=staged, avgdl=avgdl
    )
    kernel = _make_kernel(
        plan, 0, False, avgdl, emit_all=True,
        block_size=int(store.meta.get("block_size", ROARING_BLOCK_SIZE)),
        deletes=_load_delete_set(spark, store),
    )
    return (
        rows.sortWithinPartitions(
            F.col("block_bound").desc(), "block_id", "term", "field"
        )
        .mapInPandas(kernel, schema=RESULT_SCHEMA)
        .select("docid")
    )


def delete_by_query(
    spark: SparkSession,
    store: IndexStore,
    query: str,
    default_type: str = "union",
) -> None:
    """Delete every doc matching ``query`` (reference
    delete_documents_by_query, api_endpoints.rs): the matching docids
    flow straight into the delete set as a distributed write — no
    driver-side collect."""
    import os

    matches = match_docids(spark, store, query, default_type)
    mode = "append" if os.path.exists(store.deletes_path) else "overwrite"
    matches.write.mode(mode).parquet(store.deletes_path)
    invalidate_term_stats_cache(store.path)


def _load_delete_set(spark: SparkSession, store: IndexStore) -> np.ndarray:
    """Delete set as a sorted array for the kernel (the reference keeps
    an in-RAM AHashSet, `index.rs:1593-1594`). Read driver-side with
    pyarrow (no Spark job) and cached per index generation; shipped to
    executors once per query via the kernel closure — broadcast-sized.
    A corpus with massive deletes should compact instead (see
    index.compaction.compact)."""
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
    staged: list | None = None,
    block_bounds: dict[str, list[tuple[float, float]]] | None = None,
    keep_bounds: list[str] | None = None,
) -> tuple[DataFrame, list]:
    """Left-join per-block facet arrays onto the posting rows (rows
    are hash-partitioned by block_id already, so only the small facet
    side exchanges). Staged batches' facet blocks union in for
    realtime level-0. Returns (rows, extra select columns).

    ``block_bounds`` maps a numeric facet to allowed [lo, hi] value
    intervals: blocks whose stored per-block min/max (format v4 zone
    bounds) provably fall outside EVERY interval are dropped here —
    before any posting decode — mirroring the reference's segment-
    level facet skip. Blocks with unknown bounds (pre-v4 files, or a
    slice union where no slice has values) are kept; correctness
    never depends on the skip.

    ``keep_bounds`` facets additionally RETAIN their per-block zone
    bounds as ``zb_min_<fc>`` / ``zb_max_<fc>`` output columns (the
    kernel's numeric sort-key block skip reads them; null = unknown).
    """
    import os

    extra = []
    for fc in facet_cols:
        fb = store.facet_blocks(spark)
        for sb in staged or []:
            if os.path.exists(sb.facets_path):
                fb = fb.unionByName(
                    spark.read.parquet(sb.facets_path),
                    allowMissingColumns=True,
                )
        # a block can carry SEVERAL facet rows (id_col appends /
        # staged batches sharing a block, each covering its own docid
        # slice with missing elsewhere) — collect them into one row so
        # the join never duplicates posting rows; the kernel overlays
        # the buffers (non-missing slots are disjoint by construction)
        fb = fb.filter(F.col("facet") == fc)
        intervals = (block_bounds or {}).get(fc)
        want_bounds = fc in (keep_bounds or ())
        has_bounds = (intervals or want_bounds) and {
            "vmin", "vmax",
        } <= set(fb.columns)
        if has_bounds:
            # NaN bounds mean "this slice has no values" — null them so
            # the min/max over slices ignores them (Spark sorts NaN as
            # the LARGEST double, which would poison max otherwise)
            fb = fb.groupBy("block_id").agg(
                F.collect_list("fvalues").alias(f"fb_{fc}"),
                F.min(
                    F.when(~F.isnan(F.col("vmin")), F.col("vmin"))
                ).alias("_bmin"),
                F.max(
                    F.when(~F.isnan(F.col("vmax")), F.col("vmax"))
                ).alias("_bmax"),
            )
        else:
            fb = fb.groupBy("block_id").agg(
                F.collect_list("fvalues").alias(f"fb_{fc}")
            )
        rows = rows.join(fb, "block_id", "left")
        if has_bounds and intervals:
            overlap = F.lit(False)
            for lo, hi in intervals:
                overlap = overlap | (
                    (F.col("_bmin") <= F.lit(float(hi)))
                    & (F.col("_bmax") >= F.lit(float(lo)))
                )
            rows = rows.filter(F.col("_bmin").isNull() | overlap)
        if has_bounds and want_bounds:
            rows = rows.withColumnRenamed(
                "_bmin", f"zb_min_{fc}"
            ).withColumnRenamed("_bmax", f"zb_max_{fc}")
            extra += [f"zb_min_{fc}", f"zb_max_{fc}"]
        elif has_bounds:
            rows = rows.drop("_bmin", "_bmax")
        extra.append(f"fb_{fc}")
    return rows, extra


def _annotated_postings(
    spark: SparkSession,
    store: IndexStore,
    plan: QueryPlan,
    boosts: dict[int, float] | None = None,
    allowed_fields: list[int] | None = None,
    facet_cols: list[str] | None = None,
    staged: list | None = None,
    avgdl: float | None = None,
    block_bounds: dict[str, list[tuple[float, float]]] | None = None,
    keep_bounds: list[str] | None = None,
) -> DataFrame:
    if avgdl is None:
        avgdl = store.avgdl
    terms = sorted(
        set(plan.required_posting_terms())
        | (set() if plan.units is not None else set(plan.pos_terms))
        | set(plan.not_terms)
    )
    has_gram = any(NGRAM_SEP in t for t in terms)
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
    if has_gram:
        cols += [
            "tfs1_vb", "tfs2_vb", "tfs3_vb", "max_tf1", "max_tf2", "max_tf3",
        ]
    if plan.qtype == "phrase":
        cols.append("positions_vb")
    postings = _cached_postings(spark, store)
    for sb in staged or []:
        postings = postings.unionByName(spark.read.parquet(sb.postings_path))
    postings = postings.filter(
        F.col("tbucket").isin(buckets) & F.col("term").isin(terms)
    ).select(*cols)
    if allowed_fields is not None:
        # field filter pushes to the scan (reference search.rs:2483-2495)
        postings = postings.filter(
            F.col("field").isin([int(i) for i in allowed_fields])
        )
    if plan.qtype == "phrase":
        postings = postings.withColumnRenamed("positions_vb", "pos_vb")

    # term metadata as LITERAL expressions (a query touches a handful
    # of terms): no broadcast-join sub-job — a measurable chunk of the
    # per-query latency floor
    idf_expr = F.lit(0.0)
    for t, v in plan.pos_terms.items():
        idf_expr = F.when(F.col("term") == t, F.lit(float(v))).otherwise(
            idf_expr
        )
    n_fields = len(store.meta.get("fields") or ["text"])
    boost_arr = F.array(
        *[
            F.lit(float((boosts or {}).get(i, 1.0)))
            for i in range(max(n_fields, 1))
        ]
    )
    # one select for all annotation columns: each pyspark withColumn
    # is ~9 ms of py4j/plan-copy on the serving floor (profiled)
    rows = postings.select(
        "*",
        *(
            []
            if plan.qtype == "phrase"
            else [F.lit(None).cast("binary").alias("pos_vb")]
        ),
        idf_expr.alias("idf"),
        (
            F.col("term").isin(list(plan.not_terms))
            if plan.not_terms
            else F.lit(False)
        ).alias("is_not"),
        F.element_at(boost_arr, F.col("field") + 1).alias("boost"),
    )
    # format v3+: the block-max bound is computed HERE, at query time,
    # from the current avgdl — comp(max_tf, min_dl) bounds every doc in
    # the block because BM25 tf-saturation is increasing in tf and
    # decreasing in dl (reference compress_postinglist.rs:530-676);
    # valid even when avgdl drifted after the block was written. Per-
    # field rows each contribute boost·idf·comp_ub — an upper bound of
    # the BM25F sum over fields (add_result.rs:1171-1426).
    # The 256-entry decode table is ONE F.expr literal: per-element
    # F.lit cost ~2 py4j round-trips each, ~0.1 s of plan-build time
    # on every query (profiled; identical doubles — sqlexpr docstring).
    dlq_arr = F.expr(_DLQ_ARRAY_SQL)
    min_dlq = F.element_at(dlq_arr, F.col("min_dl_byte") + 1)

    def _comp_ub(tf_col):
        return (tf_col * F.lit(K + 1.0)) / (
            tf_col
            + F.lit(K)
            * (
                F.lit(1.0 - B)
                + F.lit(B) * min_dlq / F.lit(float(avgdl))
            )
        )

    single_bound = F.col("idf") * _comp_ub(F.col("max_tf"))
    bound_expr = single_bound
    for gk, parts in (plan.unit_parts or {}).items():
        # gram rows bound by the sum of their partial terms' upper
        # bounds (each partial carries its own per-block max_tf)
        g = F.lit(0.0)
        for k, part in enumerate(parts):
            g = g + F.lit(float(plan.pos_terms.get(part, 0.0))) * _comp_ub(
                F.col(f"max_tf{k + 1}")
            )
        bound_expr = F.when(F.col("term") == gk, g).otherwise(bound_expr)
    bound_contrib = F.when(F.col("is_not"), F.lit(0.0)).otherwise(
        F.col("boost") * bound_expr
    )
    n_index_fields = len(store.meta.get("fields") or ["text"])
    eff_fields = (
        len(allowed_fields) if allowed_fields is not None else n_index_fields
    )
    base_cols = [
        "term", "field", "boost", "block_id", "idf", "is_not",
        "docids_vb", "tfs_vb", "dls", "pos_vb", "block_bound",
    ]
    if has_gram:
        base_cols += ["tfs1_vb", "tfs2_vb", "tfs3_vb"]
    if len(terms) == 1 and eff_fields == 1 and not staged:
        # single posting row per block: its contribution IS the block
        # bound — skip the per-block window (one whole exchange).
        # Disabled when staged batches may add a second row per block.
        rows = rows.select("*", bound_contrib.alias("block_bound"))
        if facet_cols:
            rows, extra = _join_facet_blocks(
                spark, store, rows, facet_cols, staged,
                block_bounds=block_bounds, keep_bounds=keep_bounds,
            )
            return rows.select(*base_cols, *extra)
        return rows.select(*base_cols)
    w = Window.partitionBy("block_id")
    rows = rows.withColumn("bound_contrib", bound_contrib)
    if plan.qtype in ("intersection", "phrase", "ngram"):
        required = plan.required_posting_terms()
        rows = rows.select(
            "*",
            F.sum("bound_contrib").over(w).alias("block_bound"),
            F.size(
                F.collect_set(
                    F.when(~F.col("is_not"), F.col("term"))
                ).over(w)
            ).alias("pos_in_block"),
        ).filter(F.col("pos_in_block") >= len(required))
    else:
        rows = rows.select(
            "*", F.sum("bound_contrib").over(w).alias("block_bound")
        )
    if facet_cols:
        rows, extra = _join_facet_blocks(
            spark, store, rows, facet_cols, staged,
            block_bounds=block_bounds, keep_bounds=keep_bounds,
        )
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
    facet_filters_k: dict | None = None,
    emit_facets: list[str] | None = None,
    facet_kinds: dict[str, str] | None = None,
    facet_sizes: dict[str, int] | None = None,
    emit_all: bool = False,
    count_facets: dict | None = None,
    count_geo: dict | None = None,
    geo: dict | None = None,
    emit_dist: bool = False,
    sort_prune: tuple[str, str, int] | None = None,
):
    qtype = plan.qtype
    pos_terms = dict(plan.pos_terms)
    not_set = set(plan.not_terms)
    units = list(plan.units) if plan.units is not None else None
    unit_parts = dict(plan.unit_parts or {})
    # positional alignment runs over UNITS when the phrase was gram-
    # rewritten (gram postings carry the gram-start positions), else
    # over the raw phrase terms; a single covering unit ("ngram")
    # needs no alignment at all — adjacency is the gram's definition
    if qtype == "phrase" and units is not None:
        align = units
    elif qtype == "phrase":
        align = list(plan.phrase)
    else:
        align = []
    # scoring sources: each ORIGINAL positive term is scored from
    # exactly one posting term — its own posting, or one gram's
    # partial-tf column (full per-doc tf rides the gram posting, so
    # scores are bit-identical to the single-term path)
    source_map: dict[str, tuple[str, int | None]] = {}
    if units is not None:
        for u, _off in units:
            parts = unit_parts.get(u)
            if parts is None:
                source_map.setdefault(u, (u, None))
            else:
                for k, part in enumerate(parts):
                    source_map.setdefault(part, (u, k))
        for t in pos_terms:
            source_map.setdefault(t, (t, None))
    else:
        source_map = {t: (t, None) for t in pos_terms}
    required_terms = plan.required_posting_terms()
    delete_set = deletes if deletes is not None else np.empty(0, dtype=np.int64)
    facet_filters = list((facet_filters_k or {}).items())
    kinds = facet_kinds or {}
    emit_cols = [(f"fb_{name}", kinds.get(name, "string")) for name in (emit_facets or [])]
    cfacets = dict(count_facets or {})
    # geo distance-bucket counting (reference QueryFacet::Point /
    # Ranges::Point): label -> (bounds_km, mode, col1, col2, lat0,
    # lon0); tallied like a numeric range facet over the haversine
    # distance
    cgeo = dict(count_geo or {})
    geo_cfg = None
    if geo:
        # three storage modes: separate lat/lon f64 facets ("pair"),
        # ONE interleaved [lat, lon] f64 buffer ("point"), or ONE
        # packed u64 Morton code per doc ("morton" — half the bytes)
        if "point" in geo:
            mode = (facet_kinds or {}).get(geo["point"], "point")
            cols = (f"fb_{geo['point']}", None)
        else:
            mode = "pair"
            cols = (f"fb_{geo['lat']}", f"fb_{geo['lon']}")
        geo_cfg = (
            mode,
            cols[0],
            cols[1],
            float(geo["at"][0]),
            float(geo["at"][1]),
            float(geo["radius_km"]),
        )
    sizes = facet_sizes or {}
    # every facet buffer the kernel touches: col → (kind, n_values)
    facet_buf_kinds: dict[str, tuple[str, int]] = {}
    for name, spec in (facet_filters_k or {}).items():
        facet_buf_kinds[f"fb_{name}"] = (spec[0], sizes.get(name, 0))
    for name in emit_facets or []:
        facet_buf_kinds[f"fb_{name}"] = (
            kinds.get(name, "string"),
            sizes.get(name, 0),
        )
    for name, (kind, _b) in cfacets.items():
        facet_buf_kinds[f"fb_{name}"] = (kind, sizes.get(name, 0))
    for _label, (_b, gmode, c1, c2, _la, _lo) in cgeo.items():
        facet_buf_kinds[c1] = (
            "numeric" if gmode == "pair" else gmode, 0
        )
        if c2 is not None:
            facet_buf_kinds[c2] = ("numeric", 0)
    if geo_cfg is not None:
        facet_buf_kinds[geo_cfg[1]] = (
            "numeric" if geo_cfg[0] == "pair" else geo_cfg[0], 0
        )
        if geo_cfg[2] is not None:
            facet_buf_kinds[geo_cfg[2]] = ("numeric", 0)

    overlay_bufs = _overlay_bufs
    sset_gather = _sset_gather

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
        best_dists: np.ndarray = np.empty(0, dtype=np.float64)
        all_docids: list[np.ndarray] = []
        all_scores: list[np.ndarray] = []
        all_dists: list[np.ndarray] = []
        all_facets: dict[str, list[np.ndarray]] = {c: [] for c, _k in emit_cols}
        # numeric sort-key block skip (v5 zone bounds): top-k by a
        # numeric facet keeps the best need_k KEY values seen in this
        # partition; a block whose zone min (asc) / max (desc) cannot
        # beat the worst kept key is skipped before any decode. Only
        # admissible with nulls-last key ordering (docs with a missing
        # key never outrank need_k docs with keys).
        key_heap = np.empty(0, dtype=np.float64)
        total_matches = 0
        facet_tallies: dict[str, np.ndarray] = {
            fc: np.zeros(
                sizes.get(fc, 0)
                if kind in ("string", "string_set")
                else len(bounds) + 1,
                dtype=np.int64,
            )
            for fc, (kind, bounds) in cfacets.items()
        }
        facet_tallies.update(
            {
                label: np.zeros(len(spec[0]) + 1, dtype=np.int64)
                for label, spec in cgeo.items()
            }
        )
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
            nonlocal total_matches, key_heap
            block_id = int(rows["block_id"].iloc[0])
            if sort_prune is not None and key_heap.size >= sort_prune[2]:
                sk, sdir, _need = sort_prune
                zb_col = f"zb_{'min' if sdir == 'asc' else 'max'}_{sk}"
                zb = (
                    rows[zb_col].iloc[0] if zb_col in rows.columns else None
                )
                if zb is not None and not np.isnan(zb):
                    worst = float(key_heap[-1])
                    if (sdir == "asc" and float(zb) > worst) or (
                        sdir == "desc" and float(zb) < worst
                    ):
                        return
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
            fbufs = {
                col: overlay_bufs(rows[col].iloc[0], kind, nv)
                for col, (kind, nv) in facet_buf_kinds.items()
            }

            def fbuf_at(col: str, idx: np.ndarray):
                """Facet values at local docids, padded with missing
                when a buffer is shorter than the block's docid range."""
                fv = fbufs[col]
                if fv is None:
                    return None
                kind, nv = facet_buf_kinds[col]
                if idx.size and int(idx.max()) >= len(fv):
                    if kind == "string":
                        pad = np.full(
                            int(idx.max()) + 1,
                            facet_missing_code(nv),
                            dtype=facet_code_dtype(nv),
                        )
                    else:
                        pad = np.full(int(idx.max()) + 1, np.nan)
                    pad[: len(fv)] = fv
                    fv = pad
                return fv[idx]

            # rows grouped by posting term: realtime staged batches can
            # add a second row per (term, field, block) covering a
            # disjoint docid slice — every structure below handles
            # multiple rows per key
            recs: dict[str, list[dict]] = {}
            has_gram_rows = bool(unit_parts)
            for _, r in rows.iterrows():
                rec = {
                    "field": int(r["field"]),
                    "boost": float(r["boost"]),
                    "d": decode_docids(r["docids_vb"]),
                    "tf": decode_tfs(r["tfs_vb"]),
                    "dl": np.frombuffer(r["dls"], dtype=np.uint8),
                    "pos_vb": r["pos_vb"],
                }
                if has_gram_rows and NGRAM_SEP in r["term"]:
                    parts_n = r["term"].count(NGRAM_SEP) + 1
                    rec["partials"] = [
                        decode_tfs(r[f"tfs{k + 1}_vb"]) for k in range(parts_n)
                    ]
                recs.setdefault(r["term"], []).append(rec)

            def union_docs(term: str) -> np.ndarray:
                ds = [rec["d"] for rec in recs[term]]
                if len(ds) == 1:
                    return ds[0]
                return np.unique(np.concatenate(ds))

            if qtype in ("intersection", "phrase", "ngram"):
                if any(t not in recs for t in required_terms):
                    return
                common = union_docs(required_terms[0])
                for t in required_terms[1:]:
                    common = np.intersect1d(
                        common, union_docs(t), assume_unique=True
                    )
                    if common.size == 0:
                        return
                cand = common
            else:
                present = [t for t in required_terms if t in recs]
                if not present:
                    return
                cand = np.unique(
                    np.concatenate([union_docs(t) for t in present])
                )

            # NOT anti-probe (match in ANY field excludes)
            for t in not_set:
                if t in recs:
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

            # facet filters via the block's facet arrays (reference
            # pushes facet predicates into the pruned scan the same
            # way, search.rs:2543-2726); filtering candidates keeps the
            # block bound admissible (bound ≥ any subset's max score)
            for colname, spec in facet_filters:
                if spec[0] == "string_set":
                    buf = fbufs[f"fb_{colname}"]
                    if buf is None:
                        return
                    owner, codes = sset_gather(buf, cand)
                    hit = np.isin(codes, spec[1])
                    keep = np.zeros(cand.size, dtype=bool)
                    keep[owner[hit]] = True
                    cand = cand[keep]
                else:
                    vals = fbuf_at(f"fb_{colname}", cand)
                    if vals is None:
                        return
                    if spec[0] == "numeric":
                        cand = cand[(vals >= spec[1]) & (vals <= spec[2])]
                    else:
                        cand = cand[np.isin(vals, spec[1])]
                if cand.size == 0:
                    return

            def latlon_of(mode, c1, c2, c):
                """(lat, lon) arrays at local docids ``c`` from one of
                the three geo storage modes; (None, None) when the
                block carries no buffer."""
                if mode == "point":
                    # Point facet: interleaved pair gather
                    buf = fbufs[c1]
                    if buf is None:
                        return None, None
                    n_pts = len(buf) // 2
                    la = np.full(c.size, np.nan)
                    lo = np.full(c.size, np.nan)
                    ok = c < n_pts
                    la[ok] = buf[2 * c[ok]]
                    lo[ok] = buf[2 * c[ok] + 1]
                    return la, lo
                if mode == "morton":
                    # packed u64 gather (one 8-byte read per doc),
                    # code 0 = missing; distances run on the DECODED
                    # (i32×10^7-quantized) coordinates
                    from seekstorm_spark.functions.geo import (
                        morton_decode,
                    )

                    buf = fbufs[c1]
                    if buf is None:
                        return None, None
                    codes = np.zeros(c.size, dtype=np.uint64)
                    ok = c < len(buf)
                    codes[ok] = buf[c[ok]]
                    la = np.full(c.size, np.nan)
                    lo = np.full(c.size, np.nan)
                    has = codes != 0
                    if has.any():
                        la[has], lo[has] = morton_decode(codes[has])
                    return la, lo
                return fbuf_at(c1, c), fbuf_at(c2, c)

            def hav_km(la, lo, lat0, lon0):
                a = (
                    np.sin(np.radians(lat0 - la) / 2.0) ** 2
                    + np.cos(np.radians(la))
                    * math.cos(math.radians(lat0))
                    * np.sin(np.radians(lon0 - lo) / 2.0) ** 2
                )
                return 2.0 * EARTH_RADIUS_KM * np.arcsin(np.sqrt(a))

            # geo radius filter over numeric lat/lon facet arrays
            # (reference stores Point facets and filters/sorts by
            # haversine distance, search.rs:2712-2724)
            dists = None
            if geo_cfg is not None:
                lat, lon = latlon_of(
                    geo_cfg[0], geo_cfg[1], geo_cfg[2], cand
                )
                if lat is None or lon is None:
                    return
                lat0, lon0, radius = geo_cfg[3], geo_cfg[4], geo_cfg[5]
                d_km = hav_km(lat, lon, lat0, lon0)
                keep = ~np.isnan(d_km) & (d_km <= radius)
                cand = cand[keep]
                dists = d_km[keep]
                if cand.size == 0:
                    return

            # phrase position alignment (within a single field): units
            # align on gram-start positions, raw phrases on every term
            if align and len(align) > 1:
                keep = _phrase_filter(recs, cand, align)
                cand = cand[keep]
                if dists is not None:
                    dists = dists[keep]
                if cand.size == 0:
                    return

            total_matches += int(cand.size)
            for fc, (kind, bounds) in cfacets.items():
                nv = sizes.get(fc, 0)
                if kind == "string_set":
                    buf = fbufs[f"fb_{fc}"]
                    if buf is None:
                        continue
                    # codes are per-doc DEDUPED at encode, so this is
                    # one count per (doc, distinct value)
                    _owner, codes = sset_gather(buf, cand)
                    facet_tallies[fc] += np.bincount(
                        codes.astype(np.int64), minlength=nv
                    )[:nv]
                    continue
                fv = fbuf_at(f"fb_{fc}", cand)
                if fv is None:
                    continue
                if kind == "string":
                    valid = fv < nv  # missing sentinel excluded
                    facet_tallies[fc] += np.bincount(
                        fv[valid].astype(np.int64), minlength=nv
                    )[:nv]
                else:
                    ok = ~np.isnan(fv) & (fv >= bounds[0])
                    bins = np.searchsorted(bounds, fv[ok], side="right") - 1
                    facet_tallies[fc] += np.bincount(
                        bins, minlength=len(bounds) + 1
                    )
            for label, (gb, gmode, c1, c2, glat, glon) in cgeo.items():
                la, lo = latlon_of(gmode, c1, c2, cand)
                if la is None or lo is None:
                    continue
                gd = hav_km(la, lo, glat, glon)
                ok = ~np.isnan(gd) & (gd >= gb[0])
                bins = np.searchsorted(gb, gd[ok], side="right") - 1
                facet_tallies[label] += np.bincount(
                    bins, minlength=len(gb) + 1
                )
            if count_only:
                return

            # score in (term asc, field asc) order — the f32
            # accumulation order of the oracle SQL
            entries: list[tuple] = []
            for orig in pos_terms:
                pterm, pidx = source_map.get(orig, (orig, None))
                for rec in recs.get(pterm, []):
                    tfs = rec["tf"] if pidx is None else rec["partials"][pidx]
                    entries.append(
                        (orig, rec["field"], rec["boost"], rec["d"], tfs, rec["dl"])
                    )
            entries.sort(key=lambda e: (e[0], e[1]))
            scores = np.zeros(cand.size, dtype=np.float32)
            for term, _field, boost, d, tf, dl in entries:
                idx = np.searchsorted(d, cand)
                valid = (idx < d.size) & (d[np.minimum(idx, d.size - 1)] == cand)
                ii = idx[valid]
                contrib = np.float32(boost) * term_scores(
                    pos_terms[term], tf[ii], dl[ii]
                )
                scores[valid] += contrib
            if sort_prune is not None:
                kv = fbuf_at(f"fb_{sort_prune[0]}", cand)
                if kv is not None:
                    if kv.dtype.kind in "ui":
                        # string dictionary codes: drop the missing
                        # sentinel (dtype max) — nulls-last semantics
                        skind, snv = facet_buf_kinds[f"fb_{sort_prune[0]}"]
                        vals = kv[
                            kv != facet_missing_code(snv)
                        ].astype(np.float64)
                    else:
                        vals = kv[~np.isnan(kv)].astype(np.float64)
                    if vals.size:
                        merged = np.concatenate([key_heap, vals])
                        merged.sort()
                        if sort_prune[1] == "desc":
                            merged = merged[::-1]
                        key_heap = merged[: sort_prune[2]]
            if emit_all:
                all_docids.append(base + cand)
                all_scores.append(scores)
                if emit_dist:
                    all_dists.append(
                        dists
                        if dists is not None
                        else np.full(cand.size, np.nan)
                    )
                for colname, kind in emit_cols:
                    vals = fbuf_at(colname, cand)
                    if kind == "numeric":
                        if vals is None:
                            vals = np.full(cand.size, np.nan)
                        all_facets[colname].append(vals.astype(np.float64))
                    else:
                        if vals is None:
                            nv = facet_buf_kinds[colname][1]
                            vals = np.full(
                                cand.size, facet_missing_code(nv)
                            )
                        all_facets[colname].append(vals.astype(np.int64))
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

        if cfacets or cgeo:
            out_f, out_c, out_n = [], [], []
            for fc, tally in facet_tallies.items():
                for code in np.flatnonzero(tally):
                    out_f.append(fc)
                    out_c.append(int(code))
                    out_n.append(int(tally[code]))
            yield pd.DataFrame(
                {
                    "facet": out_f,
                    "code": pd.Series(out_c, dtype="int64"),
                    "matches": pd.Series(out_n, dtype="int64"),
                }
            )
        elif count_only:
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
            for colname, kind in emit_cols:
                if kind == "numeric":
                    out[colname] = pd.Series(
                        np.concatenate(all_facets[colname])
                        if all_facets[colname]
                        else np.empty(0, np.float64),
                        dtype="float64",
                    )
                else:
                    out[colname] = pd.Series(
                        np.concatenate(all_facets[colname])
                        if all_facets[colname]
                        else np.empty(0, np.int64),
                        dtype="int64",
                    )
            if emit_dist:
                out["geo_dist"] = pd.Series(
                    np.concatenate(all_dists)
                    if all_dists
                    else np.empty(0, np.float64),
                    dtype="float64",
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
    recs: dict[str, list[dict]],
    cand: np.ndarray,
    phrase: list[tuple[str, int]],
) -> np.ndarray:
    """Boolean mask over cand: doc has the phrase units position-aligned
    (pos_i - offset_i equal across units for some shared anchor,
    reference add_result.rs:3152-3391) — within a single field. Units
    may be gram postings (positions = gram-start) or single terms.

    Fully vectorized: each unit's (doc, field, position) triples become
    packed ``((doc << 4) | field) << 18 | (pos - offset)`` anchor keys;
    the phrase's anchors are the running ``isin`` intersection across
    units — no per-doc loop. Positions are < 2^17 (65,536 cap +
    offsets), docids block-local, field ids < 16.
    """
    SHIFT = np.int64(18)
    FSHIFT = np.int64(4)
    # pos - offset can reach -(MAX_QUERY_TERM_NUMBER-1) = -99; the bias
    # keeps keys non-negative so the doc bits stay intact (pos < 65,536,
    # so biased values stay below 2^18)
    BIAS = np.int64(128)

    def term_keys(term: str, off: int) -> np.ndarray | None:
        if term not in recs:
            return None
        parts = []
        for rec in recs[term]:
            d, tf, pos_vb = rec["d"], rec["tf"], rec["pos_vb"]
            plists = decode_positions(pos_vb, tf)
            if not len(plists):
                continue
            docs_rep = np.repeat(d, tf)
            pos_flat = np.concatenate(plists)
            parts.append(
                (
                    (
                        (docs_rep.astype(np.int64) << FSHIFT)
                        | np.int64(rec["field"])
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
