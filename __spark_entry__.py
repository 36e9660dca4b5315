"""Driver contract for the spark-graft builder (PySpark target).

`entry(spark)` — flagship: build a real inverted index over the
sf0.001 documents table and run a BM25 top-k query through the
block-max WAND kernel.

`queries()` / `oracle_sql()` — one entry per implemented operator
(SURVEY.md §2 + training-data ops), each with a DuckDB oracle; the
Spark side computes in float64 with the same operation order so
rounded values hash-match.
"""

from __future__ import annotations

import tempfile
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from seekstorm_spark.functions.dedup import (
    exact_dup_groups,
    jaccard_pairs,
    minhash_lsh_pairs,
    simhash_udf,
)
from seekstorm_spark.functions.simsearch import cosine_topk, lsh_ann_topk
from seekstorm_spark.functions.textstats import (
    doc_fingerprint,
    lang_id_udf,
    quality_features,
    ws_token_count,
)
from seekstorm_spark.quantization import DOCUMENT_LENGTH_COMPRESSION
from seekstorm_spark.query.dataframe_engine import (
    bm25_phrase_topk,
    bm25_scored,
    bm25_topk,
    doc_lengths,
    phrase_docids,
    term_df_agg,
    tokenize_udf,
    tokens,
)
from seekstorm_spark.scoring import B, K

# ---------------------------------------------------------------------------
# shared SQL fragments (DuckDB oracle side)
# ---------------------------------------------------------------------------

def _toks_from(src: str) -> str:
    return (
        "(SELECT doc_id, unnest(string_split(text, ' ')) AS term, "
        "generate_subscripts(string_split(text, ' '), 1) - 1 AS pos "
        f"FROM {src})"
    )


_TOKS = _toks_from("documents")

# update-document row: old docid, re-added docid, re-added text —
# shared between the Spark query and its DuckDB oracle
_UPD_OLD, _UPD_NEW, _UPD_TEXT = 7, 10_000_000, "fast fast fast table zzupd"

# batched multi-query row: the query strings and their oracle specs
# (terms, qtype, not_terms, phrase) must stay in lockstep
_MQ_QUERIES = (
    "fast table",
    "+fast +table",
    "fast -dup",
    "dup",
    '"fast table"',
)
_MQ_SPECS = (
    (["fast", "table"], "union", None, None),
    (["fast", "table"], "intersection", None, None),
    (["fast"], "union", ["dup"], None),
    (["dup"], "union", None, None),
    (["fast", "table"], "phrase", None, ["fast", "table"]),
)

# batched hybrid row: query i pairs with query vector vec_id=i; the
# oracle re-runs the single-query hybrid SQL per pair
_MH_QUERIES = ("fast table", "key value", "stream")
_MH_QUERY_TERMS = (["fast", "table"], ["key", "value"], ["stream"])

_K1 = repr(K + 1.0)  # identical float64 literals on both sides
_KK = repr(float(K))
_B1 = repr(1.0 - B)
_BB = repr(float(B))


def _quant_values() -> str:
    t = DOCUMENT_LENGTH_COMPRESSION
    rows = []
    for b in range(256):
        lo = t[b]
        hi = (t[b + 1] - 1) if b < 255 else (1 << 40)
        rows.append(f"({lo},{hi},{b},{t[b]})")
    return ",".join(rows)


_QUANT_CTE = (
    f"quant(dl_lo, dl_hi, dl_byte, dl_q) AS (VALUES {_quant_values()})"
)

_DLQ_CTES = (
    f"{_QUANT_CTE}, "
    "dl AS (SELECT doc_id, len(list_filter(string_split(text, ' '), "
    "x -> x <> '')) AS dl_raw FROM documents), "
    "dlq AS (SELECT doc_id, dl_raw, dl_byte, dl_q FROM dl JOIN quant "
    "ON dl_raw BETWEEN dl_lo AND dl_hi)"
)


def _in_list(terms: list[str]) -> str:
    return ",".join(f"'{t}'" for t in terms)


def _bm25_sql(
    terms: list[str],
    qtype: str = "union",
    not_terms: list[str] | None = None,
    phrase: list[str] | None = None,
    extra_where: str = "",
    top_k: int = 10,
    docs_where: str = "",
) -> str:
    """DuckDB BM25 top-k, float64, same operation order as
    `seekstorm_spark.query.dataframe_engine.bm25_topk`.

    ``docs_where`` restricts the corpus itself (df/N/avgdl included),
    matching a Spark-side pre-filter on the documents DataFrame."""
    terms = list(dict.fromkeys(terms))
    dw = f" WHERE {docs_where}" if docs_where else ""
    toks_src = _TOKS.replace("FROM documents)", f"FROM documents{dw})")
    dl_src = f"documents{dw}" if docs_where else "documents"
    filters = []
    if qtype == "intersection" or phrase:
        filters.append(f"nm = {len(terms)}")
    if not_terms:
        filters.append(
            "doc_id NOT IN (SELECT DISTINCT doc_id FROM toks "
            f"WHERE term IN ({_in_list(not_terms)}))"
        )
    if phrase:
        joins = []
        for i, t in enumerate(phrase[1:], start=1):
            joins.append(
                f"JOIN toks t{i} ON t{i}.doc_id = t0.doc_id "
                f"AND t{i}.pos = t0.pos + {i} AND t{i}.term = '{phrase[i]}'"
            )
        filters.append(
            "doc_id IN (SELECT DISTINCT t0.doc_id FROM toks t0 "
            + " ".join(joins)
            + f" WHERE t0.term = '{phrase[0]}')"
        )
    if extra_where:
        filters.append(extra_where)
    where = ("WHERE " + " AND ".join(filters)) if filters else ""
    dlq_ctes = (
        f"{_QUANT_CTE}, "
        "dl AS (SELECT doc_id, len(list_filter(string_split(text, ' '), "
        f"x -> x <> '')) AS dl_raw FROM {dl_src}), "
        "dlq AS (SELECT doc_id, dl_raw, dl_byte, dl_q FROM dl JOIN quant "
        "ON dl_raw BETWEEN dl_lo AND dl_hi)"
    )
    return f"""
WITH toks AS (SELECT * FROM {toks_src}),
{dlq_ctes},
stats AS (SELECT (SELECT count(*) FROM {dl_src})::DOUBLE AS n,
                 (SELECT sum(dl_q)::DOUBLE / count(*)::DOUBLE FROM dlq) AS avgdl),
tf AS (SELECT doc_id, term, count(*)::DOUBLE AS tf FROM toks
       WHERE term IN ({_in_list(terms)}) GROUP BY 1, 2),
dft AS (SELECT term, count(DISTINCT doc_id)::DOUBLE AS df FROM toks
        WHERE term IN ({_in_list(terms)}) GROUP BY 1),
scored AS (
  SELECT tf.doc_id,
         sum( ln((s.n - dft.df + 0.5) / (dft.df + 0.5) + 1.0)
              * (tf.tf * {_K1} / (tf.tf + {_KK} * ({_B1} + {_BB} * dlq.dl_q / s.avgdl))) ) AS score,
         count(DISTINCT tf.term) AS nm
  FROM tf JOIN dft USING (term) JOIN dlq USING (doc_id) CROSS JOIN stats s
  GROUP BY tf.doc_id)
SELECT doc_id AS docid, round(score, 4) AS score FROM scored {where}
ORDER BY round(score, 4) DESC, doc_id ASC LIMIT {top_k}
"""


def _match_count_sql(
    terms: list[str],
    qtype: str,
    not_terms: list[str] | None = None,
    phrase: list[str] | None = None,
) -> str:
    terms = list(dict.fromkeys(terms))
    having = f"HAVING count(DISTINCT term) = {len(terms)}" if qtype in (
        "intersection",
        "phrase",
    ) else ""
    nots = (
        "AND doc_id NOT IN (SELECT DISTINCT doc_id FROM toks "
        f"WHERE term IN ({_in_list(not_terms)}))"
        if not_terms
        else ""
    )
    phr = ""
    if phrase:
        joins = " ".join(
            f"JOIN toks t{i} ON t{i}.doc_id = t0.doc_id AND "
            f"t{i}.pos = t0.pos + {i} AND t{i}.term = '{phrase[i]}'"
            for i in range(1, len(phrase))
        )
        phr = (
            "AND doc_id IN (SELECT DISTINCT t0.doc_id FROM toks t0 "
            f"{joins} WHERE t0.term = '{phrase[0]}')"
        )
    return f"""
WITH toks AS (SELECT * FROM {_TOKS}),
cand AS (SELECT doc_id FROM toks WHERE term IN ({_in_list(terms)})
         GROUP BY doc_id {having})
SELECT count(*)::BIGINT AS matches FROM cand
WHERE 1=1 {nots} {phr}
"""


# ---------------------------------------------------------------------------
# indexed WAND engine oracles — f32-exact DuckDB SQL
# ---------------------------------------------------------------------------
#
# The indexed path (seekstorm_spark/query/engine.py) scores in float32
# with reference-parity math. DuckDB FLOAT arithmetic is IEEE-754
# single and bit-matches numpy f32 op-for-op (verified empirically for
# this expression shape), so the oracle mirrors the kernel's exact
# operation order with explicit ::FLOAT casts:
#   idf  = ln(f64((n32 - df32 + 0.5f)/(df32 + 0.5f) + 1.0f))::f32
#   comp = tf32*2.2f / (tf32 + 1.2f*(0.25f + (0.75f*dlq32)/avgdl32))
#   score = Σ_terms (idf*comp), accumulated in ascending-term order
#           (the kernel visits per-block rows term-ascending).


def _wand_store(spark: SparkSession, sf_dir: str):
    """Build (once per sf_dir, cached on disk) a REAL inverted index
    over the documents table; wand_* queries search through it."""
    import json
    import os

    from seekstorm_spark.index.builder import (
        INDEX_FORMAT_VERSION,
        IndexBuilder,
    )
    from seekstorm_spark.index.store import IndexStore

    name = os.path.basename(sf_dir.rstrip("/")) or "sf"
    path = f"/tmp/seekstorm_wand_idx_{name}"
    meta = os.path.join(path, "meta.json")
    if os.path.exists(meta):
        with open(meta) as f:
            m = json.load(f)
        if (
            m.get("complete")
            and m.get("version") == INDEX_FORMAT_VERSION
            and "lang" in (m.get("facets") or {})
            and "n_chars" in (m.get("facets") or {})
        ):
            return IndexStore.open(path)
    return IndexBuilder(
        spark, path, n_buckets=8, facet_cols=["lang", "n_chars"]
    ).build(_docs(spark, sf_dir), text_col="text", id_col="doc_id")


def _wandf_store(spark: SparkSession, sf_dir: str):
    """Two-field (text, source) index — the reference's default data
    model (per-field tf/positions, add_result.rs:1171-1426)."""
    import json
    import os

    from seekstorm_spark.index.builder import (
        INDEX_FORMAT_VERSION,
        IndexBuilder,
    )
    from seekstorm_spark.index.store import IndexStore

    name = os.path.basename(sf_dir.rstrip("/")) or "sf"
    path = f"/tmp/seekstorm_wandf_idx_{name}"
    meta = os.path.join(path, "meta.json")
    if os.path.exists(meta):
        with open(meta) as f:
            m = json.load(f)
        if (
            m.get("complete")
            and m.get("version") == INDEX_FORMAT_VERSION
            and m.get("fields") == ["text", "source"]
        ):
            return IndexStore.open(path)
    return IndexBuilder(
        spark, path, n_buckets=8, fields=["text", "source"]
    ).build(_docs(spark, sf_dir), id_col="doc_id")


def _wandf_query(
    qstring: str,
    default_type: str,
    boosts: list[tuple[str, float]],
    field_filter: list[str] | None = None,
    top_k: int = 10,
):
    def run(s: SparkSession, d: str) -> DataFrame:
        from seekstorm_spark.query.engine import search

        store = _wandf_store(s, d)
        out = search(
            s,
            store,
            qstring,
            top_k=top_k,
            default_type=default_type,
            fields=boosts,
            field_filter=field_filter,
        )
        return out.select(
            "docid", F.round(F.col("score").cast("double"), 4).alias("score")
        )

    return run


def _wand_bm25f_sql(
    terms: list[str],
    boosts: list[float],  # per field id: [text, source]
    field_filter: int | None = None,
    top_k: int = 10,
) -> str:
    """f32-exact BM25F top-k matching the indexed multi-field kernel:
    per-(term, field) contributions boost·(idf·comp), accumulated in
    (term asc, field asc) order; df = docs containing the term in ANY
    field; one corpus-wide avgdl over all per-field lengths."""
    uniq = sorted(set(terms))
    in_terms = _in_list(uniq)
    n_fields = len(boosts)
    boost_case = (
        "(CASE tf2.field "
        + " ".join(f"WHEN {i} THEN {repr(float(b))}{_F}" for i, b in enumerate(boosts))
        + f" END){_F}"
    )
    fwhere = f"AND field = {field_filter}" if field_filter is not None else ""
    cells = []
    acc = None
    idx = 0
    for t in uniq:
        for fid in range(n_fields):
            if field_filter is not None and fid != field_filter:
                continue
            cells.append(
                f"max(CASE WHEN term = '{t}' AND field = {fid} "
                f"THEN c END) AS c{idx}"
            )
            cell = f"COALESCE(c{idx}, 0.0{_F})"
            acc = cell if acc is None else f"({acc} + {cell})"
            idx += 1
    piv_cols = ",\n        ".join(cells)
    return f"""
WITH {_QUANT_CTE},
dl2 AS (SELECT doc_id, 0 AS field, len(list_filter(string_split(text, ' '),
                                                   x -> x <> '')) AS dl_raw
        FROM documents
        UNION ALL
        SELECT doc_id, 1 AS field, len(list_filter(string_split(source, ' '),
                                                   x -> x <> ''))
        FROM documents),
dlq2 AS (SELECT doc_id, field, dl_q FROM dl2 JOIN quant
         ON dl_raw BETWEEN dl_lo AND dl_hi),
stats AS (SELECT (SELECT count(*) FROM documents) AS n,
                 ((SELECT sum(dl_q) FROM dlq2){_F}
                  / (SELECT count(*) FROM documents){_F}) AS avgdl),
toks2 AS (SELECT doc_id, 0 AS field, unnest(list_filter(
            string_split(text, ' '), x -> x <> '')) AS term FROM documents
          UNION ALL
          SELECT doc_id, 1 AS field, unnest(list_filter(
            string_split(source, ' '), x -> x <> '')) FROM documents),
tf2 AS (SELECT doc_id, field, term, count(*) AS tf FROM toks2
        WHERE term IN ({in_terms}) {fwhere} GROUP BY 1, 2, 3),
dft AS (SELECT term, count(DISTINCT doc_id) AS df FROM toks2
        WHERE term IN ({in_terms}) GROUP BY 1),
contrib AS (
  SELECT tf2.doc_id, tf2.term, tf2.field,
         ({boost_case}
          * (ln((((s.n{_F} - dft.df{_F} + 0.5{_F}) / (dft.df{_F} + 0.5{_F}))
                 + 1.0{_F})::DOUBLE){_F}
             * ((tf2.tf{_F} * 2.2{_F})
                / (tf2.tf{_F} + 1.2{_F}
                   * (0.25{_F} + ((0.75{_F} * d.dl_q{_F}) / s.avgdl)))))) AS c
  FROM tf2 JOIN dlq2 d ON d.doc_id = tf2.doc_id AND d.field = tf2.field
  JOIN dft USING (term) CROSS JOIN stats s),
piv AS (SELECT doc_id AS docid,
        {piv_cols}
        FROM contrib GROUP BY doc_id),
scored AS (SELECT docid, {acc} AS raw FROM piv)
SELECT docid, round(raw::DOUBLE, 4) AS score FROM (
  SELECT docid, raw FROM scored
  ORDER BY raw DESC, docid ASC LIMIT {top_k})
"""


def _wand_query(qstring: str, default_type: str, top_k: int = 10):
    def run(s: SparkSession, d: str) -> DataFrame:
        from seekstorm_spark.query.engine import search

        store = _wand_store(s, d)
        out = search(s, store, qstring, top_k=top_k, default_type=default_type)
        return out.select(
            "docid", F.round(F.col("score").cast("double"), 4).alias("score")
        )

    return run


_F = "::FLOAT"


def _wand_bm25_sql(
    terms: list[str],
    qtype: str,
    not_terms: list[str] | None = None,
    phrase: list[str] | None = None,
    top_k: int = 10,
    extra_where: str = "",
    final_select: str | None = None,
    toks_src: str | None = None,
    docs_src: str = "documents",
) -> str:
    """f32-exact BM25 top-k matching the indexed WAND kernel.

    ``docs_src`` replaces the corpus itself (stats N/avgdl AND term
    dfs included) — a subquery mirrors a compacted index (survivors
    only, stats recomputed) or an updated corpus (UNION ALL of the
    re-added version; the lazily-deleted old doc stays in the stats,
    exclude it from results via ``extra_where``)."""
    uniq = sorted(set(terms))
    in_terms = _in_list(uniq)
    filters = []
    if extra_where:
        filters.append(extra_where)
    if qtype in ("intersection", "phrase") or phrase:
        filters.append(f"nm = {len(uniq)}")
    if not_terms:
        filters.append(
            "docid NOT IN (SELECT DISTINCT doc_id FROM toks "
            f"WHERE term IN ({_in_list(not_terms)}))"
        )
    if phrase:
        joins = " ".join(
            f"JOIN toks t{i} ON t{i}.doc_id = t0.doc_id "
            f"AND t{i}.pos = t0.pos + {i} AND t{i}.term = '{phrase[i]}'"
            for i in range(1, len(phrase))
        )
        filters.append(
            "docid IN (SELECT DISTINCT t0.doc_id FROM toks t0 "
            f"{joins} WHERE t0.term = '{phrase[0]}')"
        )
    where = ("WHERE " + " AND ".join(filters)) if filters else ""
    piv_cols = ",\n        ".join(
        f"max(CASE WHEN term = '{t}' THEN c END) AS c{i}"
        for i, t in enumerate(uniq)
    )
    # f32 accumulation in ascending-term order; adding 0.0f is exact,
    # so COALESCE-to-zero reproduces the kernel's masked "+=".
    acc = f"COALESCE(c0, 0.0{_F})"
    for i in range(1, len(uniq)):
        acc = f"({acc} + COALESCE(c{i}, 0.0{_F}))"
    return f"""
WITH {_QUANT_CTE},
dl AS (SELECT doc_id, len(list_filter(string_split(text, ' '),
                                      x -> x <> '')) AS dl_raw FROM {docs_src}),
dlq AS (SELECT doc_id, dl_q FROM dl JOIN quant
        ON dl_raw BETWEEN dl_lo AND dl_hi),
stats AS (SELECT (SELECT count(*) FROM {docs_src}) AS n,
                 ((SELECT sum(dl_q) FROM dlq){_F}
                  / (SELECT count(*) FROM {docs_src}){_F}) AS avgdl),
toks AS (SELECT * FROM {toks_src or _toks_from(docs_src)}),
tf AS (SELECT doc_id, term, count(*) AS tf FROM toks
       WHERE term IN ({in_terms}) GROUP BY 1, 2),
dft AS (SELECT term, count(DISTINCT doc_id) AS df FROM toks
        WHERE term IN ({in_terms}) GROUP BY 1),
contrib AS (
  SELECT tf.doc_id, tf.term,
         (ln((((s.n{_F} - dft.df{_F} + 0.5{_F}) / (dft.df{_F} + 0.5{_F}))
              + 1.0{_F})::DOUBLE){_F}
          * ((tf.tf{_F} * 2.2{_F})
             / (tf.tf{_F} + 1.2{_F}
                * (0.25{_F} + ((0.75{_F} * dlq.dl_q{_F}) / s.avgdl))))) AS c
  FROM tf JOIN dlq USING (doc_id) JOIN dft USING (term) CROSS JOIN stats s),
piv AS (SELECT doc_id AS docid, count(*) AS nm,
        {piv_cols}
        FROM contrib GROUP BY doc_id),
scored AS (SELECT docid, {acc} AS raw, nm FROM piv)
{final_select or f'''SELECT docid, round(raw::DOUBLE, 4) AS score FROM (
  SELECT docid, raw FROM scored {where}
  ORDER BY raw DESC, docid ASC LIMIT {top_k})'''}
"""


def _wand_proximity_sql(t0: str, t1: str, top_k: int = 10) -> str:
    """f32-exact Bm25fProximity twin for a bigram-covered phrase
    (reference LexicalSimilarity::Bm25fProximity, index.rs:558-568,
    add_result.rs:917-941): the adjacent-pair (gram) df/tf replace the
    partial terms' — score = idf32(N, df_gram) · comp32(tf_gram, dl),
    mirroring the kernel op-for-op with ::FLOAT casts (idf routes ln
    through float64, exactly as ``idf_f32``)."""
    return f"""
WITH {_QUANT_CTE},
dl AS (SELECT doc_id, len(list_filter(string_split(text, ' '),
                                      x -> x <> '')) AS dl_raw FROM documents),
dlq AS (SELECT doc_id, dl_q FROM dl JOIN quant
        ON dl_raw BETWEEN dl_lo AND dl_hi),
stats AS (SELECT (SELECT count(*) FROM documents) AS n,
                 ((SELECT sum(dl_q) FROM dlq){_F}
                  / (SELECT count(*) FROM documents){_F}) AS avgdl),
toks AS (SELECT * FROM {_TOKS}),
grams AS (SELECT t0.doc_id FROM toks t0 JOIN toks t1
          ON t1.doc_id = t0.doc_id AND t1.pos = t0.pos + 1
          AND t1.term = '{t1}'
          WHERE t0.term = '{t0}'),
gtf AS (SELECT doc_id, count(*) AS tf FROM grams GROUP BY 1),
gdf AS (SELECT count(*) AS df FROM gtf),
scored AS (
  SELECT gtf.doc_id AS docid,
         (ln((((s.n{_F} - gdf.df{_F} + 0.5{_F}) / (gdf.df{_F} + 0.5{_F}))
              + 1.0{_F})::DOUBLE){_F}
          * ((gtf.tf{_F} * 2.2{_F})
             / (gtf.tf{_F} + 1.2{_F}
                * (0.25{_F} + ((0.75{_F} * dlq.dl_q{_F}) / s.avgdl))))) AS raw
  FROM gtf JOIN dlq USING (doc_id) CROSS JOIN stats s CROSS JOIN gdf)
SELECT docid, round(raw::DOUBLE, 4) AS score FROM (
  SELECT docid, raw FROM scored ORDER BY raw DESC, docid ASC LIMIT {top_k})
"""


# Spark-side match counting with identical semantics. ONE tokenize
# pass (query_term_rows): per-(doc, term) rows carry tf + positions,
# so the distinct-term count, the NOT exclusion and the phrase
# adjacency check all read the same pass instead of re-tokenizing the
# corpus per subtree (guide §2.4); the adjacency predicate is the
# same JVM `exists` over per-term position arrays the phrase scorer
# uses — identical to the former positional self-join.
def _match_count_df(
    spark: SparkSession,
    docs: DataFrame,
    terms: list[str],
    qtype: str,
    not_terms: list[str] | None = None,
    phrase: list[str] | None = None,
) -> DataFrame:
    from seekstorm_spark.query.dataframe_engine import query_term_rows

    terms = list(dict.fromkeys(terms))
    phrase = phrase or []
    not_terms = not_terms or []
    scan_terms = list(
        dict.fromkeys(list(terms) + list(phrase) + list(not_terms))
    )
    rows = query_term_rows(
        docs, scan_terms, with_positions=bool(phrase)
    )
    if not_terms:
        # two consumers (candidates + exclusion): materialize the pass
        # (lazily — the first consumer's job does it)
        rows = rows.localCheckpoint(eager=False)
    # ≤1 row per (docid, term) from query_term_rows: counting the
    # non-null whens ≡ countDistinct, without the distinct rewrite
    aggs = [
        F.count(
            F.when(F.col("term").isin(terms), F.col("term"))
        ).alias("nm")
    ]
    if phrase:
        aggs.append(
            F.map_from_entries(
                F.collect_list(F.struct("term", "positions"))
            ).alias("pos")
        )
    cand = (
        rows.filter(F.col("term").isin(scan_terms) & (F.col("term") != ""))
        .groupBy("docid")
        .agg(*aggs)
    )
    if qtype in ("intersection", "phrase"):
        cand = cand.filter(F.col("nm") == len(terms))
    else:
        # union: only docs matching >= 1 of `terms` count (a doc
        # matched solely by a NOT/phrase-extra scan term must not)
        cand = cand.filter(F.col("nm") >= 1)
    if phrase:
        def _adjacent(p):
            cond = None
            for i, t in enumerate(phrase[1:], start=1):
                c = F.array_contains(F.col("pos")[F.lit(t)], p + i)
                cond = c if cond is None else (cond & c)
            return cond if cond is not None else F.lit(True)

        cand = cand.filter(
            F.exists(F.col("pos")[F.lit(phrase[0])], _adjacent)
        )
    if not_terms:
        excl = (
            rows.filter(F.col("term").isin(not_terms))
            .select("docid")
            .distinct()
        )
        cand = cand.join(excl, "docid", "left_anti")
    return cand.agg(F.count("*").cast("long").alias("matches"))


_EN_MARKERS = sorted(
    "the of and to in is that it was for on are with as".split()
)
_LANG_MARKER_SQL = {
    "en": _EN_MARKERS,
    "de": sorted("der die das und ist nicht ein eine zu mit von für".split()),
    "fr": sorted("le la les et est ne pas un une pour dans que".split()),
    "es": sorted("el la los las y es no un una para en que".split()),
}


# Model2Vec-fixture vocabulary (24 of the corpus's 31 tokens; the
# exclusions exercise the skip-unknown-word path) and the query text.
M2V_VOCAB = sorted(
    "agg batch big column customer data fast filter group hash join "
    "line merge order part query slow small spark stream table value "
    "vector window".split()
)
M2V_QUERY_TOKS = ["fast", "join", "query", "merge", "window"]
M2V_DIM = 8


def _m2v_model() -> str:
    """Deterministic static-embedding model fixture (md5-seeded; see
    functions/embedder.build_static_model) — built once under /tmp,
    corpus-independent, atomic via rename."""
    import os

    path = "/tmp/seekstorm_m2v_v1"
    if not os.path.exists(os.path.join(path, "embedder_meta.json")):
        import shutil

        from seekstorm_spark.functions.embedder import build_static_model

        tmp = f"{path}.tmp{os.getpid()}"
        shutil.rmtree(tmp, ignore_errors=True)
        build_static_model(tmp, M2V_VOCAB, dim=M2V_DIM)
        try:
            os.replace(tmp, path)
        except OSError:  # another process won the race
            shutil.rmtree(tmp, ignore_errors=True)
    return path


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/documents.parquet")


def _emb(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/embeddings.parquet")


def _emb_with_dups(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embeddings ∪ planted near-duplicates: each vector gets a copy at
    ``vec_id + 10000`` whose components carry a deterministic
    integer-hash jitter ``((vec_id·37 + i·17) mod 13 − 6) · 0.003``
    (cos ≈ 0.996 against the original; unit-norm corpus, rms component
    0.125). Pure integer + IEEE-double arithmetic so the DuckDB oracle
    reproduces the float32 components bit-identically."""
    emb = _emb(spark, sf_dir)
    jit = F.transform(
        F.col("embedding"),
        lambda x, i: (
            x.cast("double")
            + ((F.col("vec_id") * F.lit(37) + i.cast("long") * F.lit(17)) % 13
               - 6).cast("double") * F.lit(0.003)
        ).cast("float"),
    )
    # compute the jitter BEFORE renaming vec_id: a lambda's outer
    # column reference resolves against the projection output, so
    # select((vec_id+10000).alias("vec_id"), jit) would jitter with
    # the shifted id
    dups = (
        emb.withColumn("_jit", jit)
        .select(
            (F.col("vec_id") + F.lit(10000)).alias("vec_id"),
            F.col("_jit").alias("embedding"),
        )
    )
    return emb.select("vec_id", "embedding").unionByName(dups)


# ---------------------------------------------------------------------------
# entry — flagship: real index build + WAND query at sf0.001
# ---------------------------------------------------------------------------


def entry(spark: SparkSession) -> DataFrame:
    from seekstorm_spark.index.builder import IndexBuilder
    from seekstorm_spark.query.engine import search

    docs = _docs(spark, "/root/testdata/sf0.001")
    path = tempfile.mkdtemp(prefix="seekstorm_idx_")
    store = IndexBuilder(spark, path, n_buckets=8).build(
        docs, text_col="text", id_col="doc_id"
    )
    return search(
        spark, store, "fast table scan", top_k=10, default_type="intersection"
    )


# ---------------------------------------------------------------------------
# queries + oracles
# ---------------------------------------------------------------------------


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    q: dict[str, Callable[[SparkSession, str], DataFrame]] = {}

    # --- tokenization / stats (SURVEY §2.2, §2.5) ---
    q["tokenize_count"] = lambda s, d: (
        _docs(s, d)
        .filter(F.col("doc_id") < 50)
        .select(
            "doc_id",
            F.size(tokenize_udf(F.col("text"))).cast("long").alias("n_tokens"),
        )
    )
    def _q_tokenize_marks(s, d):
        # Combining-mark tokenizer parity (tokenizer.rs:85 —
        # Other_Alphabetic marks stay inside tokens, viramas split):
        # driver-checkable golden row; input is a VALUES literal, so
        # it is sf-independent. Oracle = hand-transcribed expected
        # tokens (DuckDB cannot express the mark class in RE2).
        rows = s.sql(
            "SELECT * FROM VALUES "
            "(0, '\u092e\u0947\u0930\u0940 \u0915\u093f\u0924\u093e\u092c\u094b\u0902 "
            "\u0905\u091a\u094d\u091b\u0940 \u0939\u0948\u0902'), "
            "(1, '\u0bb5\u0bc0\u0b9f\u0bc1\u0b95\u0bb3\u0bbf\u0bb2\u0bcd "
            "\u0b87\u0bb0\u0bc1\u0ba8\u0bcd\u0ba4\u0bc1'), "
            "(2, '\u05d3\u05d0\u05e1 \u05d1\u05d5\u05da \u05d0\u05d9\u05d6 \u05d2\u05d5\u05d8'), "
            "(3, '\u0639\u064e\u0631\u064e\u0628\u0650\u064a\u0651 \u0643\u0650\u062a\u064e\u0627\u0628'), "
            "(4, 'c++ and c# in x-ray') AS t(sid, s)"
        )
        return (
            rows.select("sid", F.posexplode(tokenize_udf(F.col("s"))))
            .select(
                F.col("sid").cast("long").alias("sid"),
                F.col("pos").cast("long").alias("pos"),
                F.col("col").alias("token"),
            )
        )

    q["tokenize_marks"] = _q_tokenize_marks
    # map-side pre-aggregated twin of tokens().groupBy(term).agg(
    # countDistinct(docid), count(*)) — integer-exact, shuffles
    # vocabulary-sized partials instead of corpus-sized token rows
    q["term_df"] = lambda s, d: term_df_agg(_docs(s, d))
    q["doc_length_quantized"] = lambda s, d: (
        doc_lengths(_docs(s, d), s).select(
            "docid",
            "dl_raw",
            F.col("dl_q").cast("long").alias("dl_q"),
        )
    )
    q["corpus_stats"] = lambda s, d: (
        doc_lengths(_docs(s, d), s).agg(
            F.count("*").cast("long").alias("n_docs"),
            F.round(F.sum("dl_q") / F.count("*"), 6).alias("avgdl"),
            F.sum("dl_raw").cast("long").alias("total_tokens"),
        )
    )

    # --- BM25 scoring + query algebra (SURVEY §2.4, §2.6, §2.7) ---
    q["bm25_topk_and"] = lambda s, d: bm25_topk(
        s, _docs(s, d), ["fast", "table"], "intersection"
    )
    q["bm25_topk_or"] = lambda s, d: bm25_topk(
        s, _docs(s, d), ["fast", "table"], "union"
    )
    q["bm25_topk_or3"] = lambda s, d: bm25_topk(
        s, _docs(s, d), ["key", "value", "stream"], "union"
    )
    q["bm25_not"] = lambda s, d: bm25_topk(
        s, _docs(s, d), ["fast"], "union", not_terms=["dup"]
    )
    q["bm25_single_rare"] = lambda s, d: bm25_topk(s, _docs(s, d), ["dup"], "union")
    q["bm25_phrase"] = lambda s, d: bm25_phrase_topk(
        s, _docs(s, d), ["fast", "table"]
    )
    # --- indexed block-max WAND engine (the actual product path:
    # real index build → bucket-pruned scan → f32 kernel; reference
    # search.rs:1154-2131). Oracles are f32-exact DuckDB SQL. ---
    q["wand_topk_and"] = _wand_query("fast table", "intersection")
    q["wand_topk_or"] = _wand_query("fast table", "union")
    q["wand_topk_or3"] = _wand_query("key value stream", "union")
    q["wand_phrase"] = _wand_query('"fast table"', "union")
    q["wand_not"] = _wand_query("fast -dup", "union")
    q["wand_single"] = _wand_query("dup", "union")

    # enable_fallback (reference Index.enable_fallback, default-off;
    # search.rs:3555-3559): an AND yielding fewer than top_k results
    # retries the same terms as OR. Fixture: a 40-doc slice where
    # '+dup +query' intersects in <10 docs at BOTH driver SFs (0 at
    # sf0.01, 4 at sf0.001) while both terms exist — the returned page
    # is therefore the UNION top-10, which is what the oracle scores.
    def wand_fallback(s: SparkSession, d: str) -> DataFrame:
        import json
        import os

        from seekstorm_spark.index.builder import (
            INDEX_FORMAT_VERSION,
            IndexBuilder,
        )
        from seekstorm_spark.index.store import IndexStore
        from seekstorm_spark.query.engine import search

        name = os.path.basename(d.rstrip("/")) or "sf"
        path = f"/tmp/seekstorm_wandfb_idx_{name}"
        meta = os.path.join(path, "meta.json")
        store = None
        if os.path.exists(meta):
            with open(meta) as f:
                m = json.load(f)
            if m.get("complete") and m.get("version") == INDEX_FORMAT_VERSION:
                store = IndexStore.open(path)
        if store is None:
            store = IndexBuilder(s, path, n_buckets=4).build(
                _docs(s, d).filter(F.col("doc_id") < 40),
                text_col="text", id_col="doc_id",
            )
        strict_n = search(
            s, store, "+dup +query", top_k=10, default_type="union"
        ).count()
        assert strict_n < 10, f"fixture drift: AND matched {strict_n} >= 10"
        out = search(
            s, store, "+dup +query", top_k=10, default_type="union",
            enable_fallback=True,
        )
        return out.select(
            "docid", F.round(F.col("score").cast("double"), 4).alias("score")
        )

    q["wand_fallback"] = wand_fallback

    # phrase via n-gram index (frequent-pair pre-join; same oracle as
    # the positional phrase — scores must be identical, reference
    # NGRAM_SEARCH.md "faithful N-gram Bm25f")
    def wand_phrase_ngram(s: SparkSession, d: str) -> DataFrame:
        import json
        import os

        from seekstorm_spark.index.builder import (
            INDEX_FORMAT_VERSION,
            IndexBuilder,
        )
        from seekstorm_spark.index.store import IndexStore
        from seekstorm_spark.query.engine import _plan, search

        name = os.path.basename(d.rstrip("/")) or "sf"
        path = f"/tmp/seekstorm_wandng_idx_{name}"
        meta = os.path.join(path, "meta.json")
        store = None
        if os.path.exists(meta):
            with open(meta) as f:
                m = json.load(f)
            if m.get("complete") and m.get("version") == INDEX_FORMAT_VERSION \
                    and m.get("frequent_terms"):
                store = IndexStore.open(path)
        if store is None:
            store = IndexBuilder(
                s, path, n_buckets=8, frequent_terms=["fast", "table"]
            ).build(_docs(s, d), text_col="text", id_col="doc_id")
        assert _plan(s, store, '"fast table"', "union").qtype == "ngram"
        out = search(s, store, '"fast table"', top_k=10, default_type="union")
        return out.select(
            "docid", F.round(F.col("score").cast("double"), 4).alias("score")
        )

    q["wand_phrase_ngram"] = wand_phrase_ngram

    # 3-term phrase via a pre-joined TRIGRAM posting (greedy trigram-
    # first rewrite; reference NgramFFF, tokenizer.rs:898-1387,
    # index.rs:1833-1872) — same oracle as the positional phrase
    def wand_phrase_ngram3(s: SparkSession, d: str) -> DataFrame:
        import json
        import os

        from seekstorm_spark.index.builder import (
            INDEX_FORMAT_VERSION,
            NGRAM_SEP,
            IndexBuilder,
        )
        from seekstorm_spark.index.store import IndexStore
        from seekstorm_spark.query.engine import _plan, search

        name = os.path.basename(d.rstrip("/")) or "sf"
        path = f"/tmp/seekstorm_wandng3_idx_{name}"
        meta = os.path.join(path, "meta.json")
        store = None
        if os.path.exists(meta):
            with open(meta) as f:
                m = json.load(f)
            if m.get("complete") and m.get("version") == INDEX_FORMAT_VERSION \
                    and "fff" in (m.get("ngram_patterns") or []):
                store = IndexStore.open(path)
        if store is None:
            store = IndexBuilder(
                s, path, n_buckets=8,
                frequent_terms=["fast", "table", "scan"],
                ngram_patterns=["ff", "fff"],
            ).build(_docs(s, d), text_col="text", id_col="doc_id")
        plan = _plan(s, store, '"fast table scan"', "union")
        assert plan.qtype == "ngram"  # trigram rewrite engaged
        if plan.units:
            assert plan.units[0][0].count(NGRAM_SEP) == 2
        out = search(
            s, store, '"fast table scan"', top_k=10, default_type="union"
        )
        return out.select(
            "docid", F.round(F.col("score").cast("double"), 4).alias("score")
        )

    q["wand_phrase_ngram3"] = wand_phrase_ngram3

    # realtime level-0: half the corpus committed, the other half only
    # STAGED (uncommitted micro-batch) — searching with staged=[batch]
    # must equal the full-corpus oracle BEFORE any commit (reference
    # realtime_search.rs:921-2095)
    def wand_realtime(s: SparkSession, d: str) -> DataFrame:
        import json
        import os

        from seekstorm_spark.index.builder import (
            INDEX_FORMAT_VERSION,
            IndexBuilder,
        )
        from seekstorm_spark.index.store import IndexStore
        from seekstorm_spark.query.engine import search
        from seekstorm_spark.streaming.incremental import stage_batch

        docs = _docs(s, d)
        half = int(docs.agg(F.max("doc_id")).collect()[0][0]) // 2 + 1
        name = os.path.basename(d.rstrip("/")) or "sf"
        path = f"/tmp/seekstorm_wandrt_idx_{name}"
        meta = os.path.join(path, "meta.json")
        store = None
        if os.path.exists(meta):
            with open(meta) as f:
                m = json.load(f)
            if m.get("complete") and m.get("version") == INDEX_FORMAT_VERSION \
                    and m.get("n_docs") == half and not m.get("applied_batches"):
                store = IndexStore.open(path)
        if store is None:
            store = IndexBuilder(s, path, n_buckets=8).build(
                docs.filter(F.col("doc_id") < half),
                text_col="text", id_col="doc_id",
            )
        staged = stage_batch(
            s, store, docs.filter(F.col("doc_id") >= half),
            text_col="text", batch_id=1, id_col="doc_id",
        )
        assert staged is not None  # never committed — always re-stages
        out = search(
            s, store, "fast table", top_k=10,
            default_type="intersection", staged=[staged],
        )
        return out.select(
            "docid", F.round(F.col("score").cast("double"), 4).alias("score")
        )

    q["wand_realtime"] = wand_realtime

    # query rewrite inside search(): misspelled terms (df 0) replaced
    # by their SymSpell correction (SearchRewrite, search.rs:1200-1411)
    def wand_spell_rewrite(s: SparkSession, d: str) -> DataFrame:
        from seekstorm_spark.query.engine import search
        from seekstorm_spark.query.spell import (
            build_spell_dictionary,
            has_spell,
        )

        store = _wand_store(s, d)
        if not has_spell(store):
            build_spell_dictionary(s, store)
        out = search(
            s, store, "fsat tabel", top_k=10,
            default_type="intersection", rewrite="spell",
        )
        return out.select(
            "docid", F.round(F.col("score").cast("double"), 4).alias("score")
        )

    q["wand_spell_rewrite"] = wand_spell_rewrite

    # trailing-prefix completion (SearchSuggest): "fast st" completes
    # the last term from the QAC dictionary before planning
    def wand_suggest_rewrite(s: SparkSession, d: str) -> DataFrame:
        from seekstorm_spark.query.engine import search
        from seekstorm_spark.query.spell import (
            build_completion_dictionary,
            has_completions,
        )

        store = _wand_store(s, d)
        if not has_completions(store):
            build_completion_dictionary(s, store)
        out = search(
            s, store, "fast st", top_k=10, default_type="union",
            rewrite="suggest",
        )
        return out.select(
            "docid", F.round(F.col("score").cast("double"), 4).alias("score")
        )

    q["wand_suggest_rewrite"] = wand_suggest_rewrite

    # facet counting INSIDE the pruned scan over ALL matching docs
    # (reference add_result.rs:487-646) — not a DataFrame-side group-by
    def wand_facet_count(s: SparkSession, d: str) -> DataFrame:
        from seekstorm_spark.query.engine import facet_counts

        store = _wand_store(s, d)
        return facet_counts(s, store, "fast", ["lang"]).select(
            "facet", "value", F.col("n").cast("long").alias("n")
        )

    q["wand_facet_count"] = wand_facet_count

    # QueryFacet prefix + length options (search.rs:335-369): filter
    # returned facet values by prefix / cap to the top-N by (count
    # desc, value asc) — counts per value unchanged
    def wand_facet_prefix(s: SparkSession, d: str) -> DataFrame:
        from seekstorm_spark.query.engine import facet_counts

        return facet_counts(
            s, _wand_store(s, d), "fast", ["lang"],
            prefix={"lang": "e"},
        ).select(
            "value", F.col("n").cast("long").alias("n")
        ).orderBy("value")

    q["wand_facet_prefix"] = wand_facet_prefix

    def wand_facet_topn(s: SparkSession, d: str) -> DataFrame:
        from seekstorm_spark.query.engine import facet_counts

        return facet_counts(
            s, _wand_store(s, d), "fast", ["lang"], length=3
        ).select(
            "value", F.col("n").cast("long").alias("n")
        ).orderBy(F.col("n").desc(), F.col("value").asc())

    q["wand_facet_topn"] = wand_facet_topn

    # numeric RANGE facet counting inside the scan, with cumulative
    # mode (reference RangeType + CountWithinRange, search.rs:3598-3764)
    def wand_facet_range(s: SparkSession, d: str) -> DataFrame:
        from seekstorm_spark.query.engine import facet_range_counts

        store = _wand_store(s, d)
        return facet_range_counts(
            s, store, "fast", {"n_chars": [0.0, 100.0, 200.0, 300.0]},
            cumulative=True,
        ).select(
            "facet", "bucket_lo",
            F.col("n").cast("long").alias("n"),
            F.col("n_cumulative").cast("long").alias("n_cumulative"),
        )

    q["wand_facet_range"] = wand_facet_range

    # numeric facet filter inside the kernel (closed range)
    def wand_numeric_facet_filter(s: SparkSession, d: str) -> DataFrame:
        from seekstorm_spark.query.engine import search

        store = _wand_store(s, d)
        out = search(
            s, store, "fast table", top_k=10, default_type="union",
            facet_filters={"n_chars": (100, 300)},
        )
        return out.select(
            "docid", F.round(F.col("score").cast("double"), 4).alias("score")
        )

    q["wand_numeric_facet_filter"] = wand_numeric_facet_filter

    # geo radius filter through the REAL index: lat/lon stored as
    # numeric facet arrays, haversine applied inside the kernel
    # (reference Point facets, search.rs:2712-2724)
    def _wandgeo_store(s: SparkSession, d: str):
        import json
        import os

        from seekstorm_spark.index.builder import (
            INDEX_FORMAT_VERSION,
            IndexBuilder,
        )
        from seekstorm_spark.index.store import IndexStore

        name = os.path.basename(d.rstrip("/")) or "sf"
        path = f"/tmp/seekstorm_wandgeo_idx_{name}"
        meta = os.path.join(path, "meta.json")
        if os.path.exists(meta):
            with open(meta) as f:
                m = json.load(f)
            if m.get("complete") and m.get("version") == INDEX_FORMAT_VERSION \
                    and "lat" in (m.get("facets") or {}):
                return IndexStore.open(path)
        docs = (
            _docs(s, d)
            .withColumn("lat", (F.col("doc_id") * 37 % 18000) / 100.0 - 90.0)
            .withColumn("lon", (F.col("doc_id") * 73 % 36000) / 100.0 - 180.0)
        )
        return IndexBuilder(
            s, path, n_buckets=8, facet_cols=["lat", "lon"]
        ).build(docs, text_col="text", id_col="doc_id")

    _GEO_FILTER = {
        "lat": "lat", "lon": "lon",
        "at": (48.8566, 2.3522), "radius_km": 6000.0,
    }

    def wand_geo_radius(s: SparkSession, d: str) -> DataFrame:
        from seekstorm_spark.query.engine import search

        out = search(
            s, _wandgeo_store(s, d), "fast", top_k=10,
            default_type="union", geo_filter=dict(_GEO_FILTER),
        )
        return out.select(
            "docid", F.round(F.col("score").cast("double"), 4).alias("score")
        )

    q["wand_geo_radius"] = wand_geo_radius

    # geo distance-bucket facet counting (reference QueryFacet::Point /
    # Ranges::Point, search.rs:330-420): per-bucket tallies of ALL
    # matches from a base point, computed inside the pruned scan with
    # the same haversine as the geo filter; cumulative =
    # CountWithinRange running sums
    def wand_geo_range_facet(s: SparkSession, d: str) -> DataFrame:
        from seekstorm_spark.query.engine import geo_range_counts

        return (
            geo_range_counts(
                s, _wandgeo_store(s, d), "fast", (48.8566, 2.3522),
                [0.0, 3000.0, 8000.0, 15000.0], lat="lat", lon="lon",
                cumulative=True,
            )
            .select(
                "bucket_lo",
                F.col("n").cast("long").alias("n"),
                F.col("n_cumulative").cast("long").alias("n_cum"),
            )
            .orderBy("bucket_lo")
        )

    q["wand_geo_range_facet"] = wand_geo_range_facet

    # batched geo distance-bucket facets: N queries' tallies in ONE
    # action (per-query bases and bucket sets), fused like every other
    # batched count — per-query ≡ geo_range_counts (pytest)
    def wand_multi_geo_range(s: SparkSession, d: str) -> DataFrame:
        from seekstorm_spark.query.engine import geo_range_counts_many

        reqs = [
            ("fast", {"base": (48.8566, 2.3522),
                      "ranges": [0.0, 3000.0, 8000.0, 15000.0],
                      "lat": "lat", "lon": "lon"}),
            ("fast table", {"base": (-20.0, 130.0),
                            "ranges": [0.0, 6000.0],
                            "lat": "lat", "lon": "lon"}),
        ]
        return (
            geo_range_counts_many(s, _wandgeo_store(s, d), reqs)
            .select(
                "query_id", "bucket_lo",
                F.col("n").cast("long").alias("n"),
            )
            .orderBy("query_id", "bucket_lo")
        )

    q["wand_multi_geo_range"] = wand_multi_geo_range

    # distance result-sort (reference Point facet ResultSort,
    # min_heap.rs Point comparator): nearest matches first, distance
    # values emitted by the kernel and checked against DuckDB trig
    def wand_geo_sort(s: SparkSession, d: str) -> DataFrame:
        from seekstorm_spark.query.engine import search

        out = search(
            s, _wandgeo_store(s, d), "fast", top_k=10,
            default_type="union", geo_filter=dict(_GEO_FILTER),
            result_sort=[("geo_dist", "asc")],
        )
        return out.select(
            "docid", F.round(F.col("geo_dist"), 4).alias("geo_dist")
        )

    q["wand_geo_sort"] = wand_geo_sort

    # miles unit (reference DistanceUnit): radius given in miles,
    # distances emitted in miles — same candidates, rescaled column
    def wand_geo_miles(s: SparkSession, d: str) -> DataFrame:
        from seekstorm_spark.functions.geo import KM_PER_MILE
        from seekstorm_spark.query.engine import search

        gf = {
            "lat": "lat", "lon": "lon", "at": _GEO_FILTER["at"],
            "radius_mi": _GEO_FILTER["radius_km"] / KM_PER_MILE,
        }
        out = search(
            s, _wandgeo_store(s, d), "fast", top_k=10,
            default_type="union", geo_filter=gf,
            result_sort=[("geo_dist", "asc")],
        )
        return out.select(
            "docid", F.round(F.col("geo_dist"), 4).alias("geo_dist_mi")
        )

    q["wand_geo_miles"] = wand_geo_miles

    # Point facet (reference Point type, search.rs:2712-2724): ONE
    # [lat, lon] facet column → one interleaved per-block buffer;
    # filter + distance sort must equal the lat/lon-pair form (same
    # oracle SQL as wand_geo_sort)
    def wand_geo_point(s: SparkSession, d: str) -> DataFrame:
        import json
        import os

        from seekstorm_spark.index.builder import (
            INDEX_FORMAT_VERSION,
            IndexBuilder,
        )
        from seekstorm_spark.index.store import IndexStore
        from seekstorm_spark.query.engine import search

        name = os.path.basename(d.rstrip("/")) or "sf"
        path = f"/tmp/seekstorm_wandpt_idx_{name}"
        meta = os.path.join(path, "meta.json")
        store = None
        if os.path.exists(meta):
            with open(meta) as f:
                m = json.load(f)
            if m.get("complete") and m.get("version") == INDEX_FORMAT_VERSION \
                    and (m.get("facets") or {}).get("location", {}).get("type") == "point":
                store = IndexStore.open(path)
        if store is None:
            docs = _docs(s, d).withColumn(
                "location",
                F.array(
                    (F.col("doc_id") * 37 % 18000) / 100.0 - 90.0,
                    (F.col("doc_id") * 73 % 36000) / 100.0 - 180.0,
                ),
            )
            store = IndexBuilder(
                s, path, n_buckets=8, facet_cols=["location"]
            ).build(docs, text_col="text", id_col="doc_id")
        out = search(
            s, store, "fast", top_k=10, default_type="union",
            geo_filter={
                "point": "location",
                "at": _GEO_FILTER["at"],
                "radius_km": _GEO_FILTER["radius_km"],
            },
            result_sort=[("geo_dist", "asc")],
        )
        return out.select(
            "docid", F.round(F.col("geo_dist"), 4).alias("geo_dist")
        )

    q["wand_geo_point"] = wand_geo_point

    # PACKED Point facet: one u64 Morton code per doc (i32×10^7
    # coordinate quantization, reference geo_search.rs:33) — half the
    # buffer bytes of the pair form; the oracle mirrors the
    # quantization exactly (trunc(x·10^7)/10^7 on both sides), so
    # distances stay float64-identical
    def wand_geo_morton(s: SparkSession, d: str) -> DataFrame:
        import json
        import os

        from seekstorm_spark.index.builder import (
            INDEX_FORMAT_VERSION,
            IndexBuilder,
        )
        from seekstorm_spark.index.store import IndexStore
        from seekstorm_spark.query.engine import search

        name = os.path.basename(d.rstrip("/")) or "sf"
        path = f"/tmp/seekstorm_wandmt_idx_{name}"
        meta = os.path.join(path, "meta.json")
        store = None
        if os.path.exists(meta):
            with open(meta) as f:
                m = json.load(f)
            if m.get("complete") and m.get("version") == INDEX_FORMAT_VERSION \
                    and (m.get("facets") or {}).get("location", {}).get("type") == "morton":
                store = IndexStore.open(path)
        if store is None:
            docs = _docs(s, d).withColumn(
                "location",
                F.array(
                    (F.col("doc_id") * 37 % 18000) / 100.0 - 90.0,
                    (F.col("doc_id") * 73 % 36000) / 100.0 - 180.0,
                ),
            )
            store = IndexBuilder(
                s, path, n_buckets=8, facet_cols=["location"],
                facet_types={"location": "morton"},
            ).build(docs, text_col="text", id_col="doc_id")
        out = search(
            s, store, "fast", top_k=10, default_type="union",
            geo_filter={
                "point": "location",
                "at": _GEO_FILTER["at"],
                "radius_km": _GEO_FILTER["radius_km"],
            },
            result_sort=[("geo_dist", "asc")],
        )
        return out.select(
            "docid", F.round(F.col("geo_dist"), 4).alias("geo_dist")
        )

    q["wand_geo_morton"] = wand_geo_morton

    # delete-by-query (reference delete_documents_by_query,
    # api_endpoints.rs): matching docids stream into the delete set as
    # a distributed write; subsequent searches exclude them. Own store
    # (the delete set must not leak into the other wand rows); re-runs
    # re-delete the same set — idempotent results.
    def wand_delete_by_query(s: SparkSession, d: str) -> DataFrame:
        import json
        import os

        from seekstorm_spark.index.builder import (
            INDEX_FORMAT_VERSION,
            IndexBuilder,
        )
        from seekstorm_spark.index.store import IndexStore
        from seekstorm_spark.query.engine import delete_by_query, search

        name = os.path.basename(d.rstrip("/")) or "sf"
        path = f"/tmp/seekstorm_wanddel_idx_{name}"
        meta = os.path.join(path, "meta.json")
        store = None
        if os.path.exists(meta):
            with open(meta) as f:
                m = json.load(f)
            if m.get("complete") and m.get("version") == INDEX_FORMAT_VERSION:
                store = IndexStore.open(path)
        if store is None:
            store = IndexBuilder(s, path, n_buckets=8).build(
                _docs(s, d), text_col="text", id_col="doc_id"
            )
        delete_by_query(s, store, "dup", "union")
        out = search(s, store, "fast table", top_k=10, default_type="union")
        return out.select(
            "docid", F.round(F.col("score").cast("double"), 4).alias("score")
        )

    q["wand_delete_by_query"] = wand_delete_by_query

    # compaction: delete-by-query then compact() — postings rewritten
    # minus the deleted docs, stats (N/avgdl/df) RECOMPUTED from the
    # survivors (reference level rewrite, commit.rs:203-258). The
    # oracle scores a corpus that never contained the deleted docs.
    def wand_compacted(s: SparkSession, d: str) -> DataFrame:
        import json
        import os

        from seekstorm_spark.index.builder import (
            INDEX_FORMAT_VERSION,
            IndexBuilder,
        )
        from seekstorm_spark.index.compaction import compact
        from seekstorm_spark.index.store import IndexStore
        from seekstorm_spark.query.engine import delete_by_query, search

        name = os.path.basename(d.rstrip("/")) or "sf"
        path = f"/tmp/seekstorm_wandcmp_idx_{name}"
        meta = os.path.join(path, "meta.json")
        marker = os.path.join(path, "COMPACTED_R3")
        store = None
        if os.path.exists(meta) and os.path.exists(marker):
            with open(meta) as f:
                m = json.load(f)
            if m.get("complete") and m.get("version") == INDEX_FORMAT_VERSION:
                store = IndexStore.open(path)
        if store is None:
            store = IndexBuilder(s, path, n_buckets=8).build(
                _docs(s, d), text_col="text", id_col="doc_id"
            )
            delete_by_query(s, store, "dup", "union")
            store = compact(s, store)
            with open(marker, "w") as f:
                f.write("1")
        out = search(s, store, "fast table", top_k=10, default_type="union")
        return out.select(
            "docid", F.round(F.col("score").cast("double"), 4).alias("score")
        )

    q["wand_compacted"] = wand_compacted

    # update-document (reference update = delete + re-add,
    # api_endpoints.rs): doc 7 gets new text at a fresh docid; the old
    # version is lazily deleted, so stats still count it — the oracle
    # corpus is documents UNION ALL the new version, results exclude
    # the old docid.
    def wand_update_doc(s: SparkSession, d: str) -> DataFrame:
        import json
        import os

        from seekstorm_spark.index.builder import (
            INDEX_FORMAT_VERSION,
            IndexBuilder,
        )
        from seekstorm_spark.index.store import IndexStore
        from seekstorm_spark.query.engine import search
        from seekstorm_spark.streaming.incremental import update_documents

        name = os.path.basename(d.rstrip("/")) or "sf"
        path = f"/tmp/seekstorm_wandupd_idx_{name}"
        meta = os.path.join(path, "meta.json")
        marker = os.path.join(path, "UPDATED_R3")
        store = None
        if os.path.exists(meta) and os.path.exists(marker):
            with open(meta) as f:
                m = json.load(f)
            if m.get("complete") and m.get("version") == INDEX_FORMAT_VERSION:
                store = IndexStore.open(path)
        if store is None:
            store = IndexBuilder(s, path, n_buckets=8).build(
                _docs(s, d), text_col="text", id_col="doc_id"
            )
            new_version = s.createDataFrame(
                [(_UPD_NEW, _UPD_TEXT)], "doc_id long, text string"
            )
            store = update_documents(
                s, store, new_version, old_docids=[_UPD_OLD],
                batch_id=1, id_col="doc_id",
            )
            with open(marker, "w") as f:
                f.write("1")
        out = search(s, store, "fast table", top_k=10, default_type="union")
        return out.select(
            "docid", F.round(F.col("score").cast("double"), 4).alias("score")
        )

    q["wand_update_doc"] = wand_update_doc

    # CSV ingest round-trip: documents → CSV (Spark writer, RFC4180
    # quoting) → spark.read.csv with an explicit schema → aggregate;
    # the oracle computes the same aggregate from the parquet source,
    # so any parse/quote/type loss in the CSV path breaks the hashes
    def ingest_csv(s: SparkSession, d: str) -> DataFrame:
        import os

        name = os.path.basename(d.rstrip("/")) or "sf"
        path = f"/tmp/seekstorm_csv_{name}"
        if not os.path.exists(os.path.join(path, "_SUCCESS")):
            (
                _docs(s, d)
                .select("doc_id", "lang", "n_chars", "text")
                .coalesce(1)
                .write.mode("overwrite")
                .option("header", True)
                .csv(path)
            )
        df = (
            s.read.option("header", True)
            .schema("doc_id long, lang string, n_chars long, text string")
            .csv(path)
        )
        return df.groupBy("lang").agg(
            F.count("*").cast("long").alias("n"),
            F.sum("n_chars").cast("long").alias("total_chars"),
            F.sum(F.length("text")).cast("long").alias("total_text_len"),
        )

    q["ingest_csv"] = ingest_csv

    # batched multi-query: N queries fused into ONE Spark action
    # (shared union-of-terms scan, one exchange, one kernel with
    # per-query top-k heaps + WAND thresholds; phrase queries ride
    # as exact fallback branches in the same action) — the serving
    # throughput path (reference multi-threaded QPS bench)
    def wand_multi_query(s: SparkSession, d: str) -> DataFrame:
        from seekstorm_spark.query.engine import search_many

        store = _wand_store(s, d)
        out = search_many(
            s, store, list(_MQ_QUERIES), top_k=10, default_type="union"
        )
        return out.select(
            "query_id", "docid",
            F.round(F.col("score").cast("double"), 4).alias("score"),
        )

    q["wand_multi_query"] = wand_multi_query

    # StringSet (multi-value) facets in the kernel: per-block CSR
    # arrays; filter = doc matches if ANY of its values is allowed;
    # counting = one count per (matching doc, distinct value)
    # (reference StringSet facet type, search.rs:2543-2726)
    def _wandset_store(s: SparkSession, d: str):
        import json
        import os

        from seekstorm_spark.index.builder import (
            INDEX_FORMAT_VERSION,
            IndexBuilder,
        )
        from seekstorm_spark.index.store import IndexStore

        name = os.path.basename(d.rstrip("/")) or "sf"
        path = f"/tmp/seekstorm_wandset_idx_{name}"
        meta = os.path.join(path, "meta.json")
        if os.path.exists(meta):
            with open(meta) as f:
                m = json.load(f)
            if m.get("complete") and m.get("version") == INDEX_FORMAT_VERSION \
                    and (m.get("facets") or {}).get("tags", {}).get("type") == "string_set":
                return IndexStore.open(path)
        docs = _docs(s, d).withColumn(
            "tags",
            F.array(
                F.concat(F.lit("t"), (F.col("doc_id") % 5).cast("string")),
                F.concat(
                    F.lit("t"), ((F.col("doc_id") * 7) % 5).cast("string")
                ),
            ),
        )
        return IndexBuilder(
            s, path, n_buckets=8, facet_cols=["tags"]
        ).build(docs, text_col="text", id_col="doc_id")

    def wand_facet_set_filter(s: SparkSession, d: str) -> DataFrame:
        from seekstorm_spark.query.engine import search

        store = _wandset_store(s, d)
        out = search(
            s, store, "fast table", top_k=10, default_type="union",
            facet_filters={"tags": ["t1"]},
        )
        return out.select(
            "docid", F.round(F.col("score").cast("double"), 4).alias("score")
        )

    q["wand_facet_set_filter"] = wand_facet_set_filter

    def wand_facet_set_count(s: SparkSession, d: str) -> DataFrame:
        from seekstorm_spark.query.engine import facet_counts

        store = _wandset_store(s, d)
        return facet_counts(s, store, "fast", ["tags"]).select(
            "facet", "value", F.col("n").cast("long").alias("n")
        )

    q["wand_facet_set_count"] = wand_facet_set_count

    # spell correction (SymSpell delete-neighborhood + Levenshtein
    # verify; reference search.rs:1200-1411, commit.rs:428-448) and
    # query autocomplete (completion dictionary, commit.rs:417-426)
    def spell_correct_q(s: SparkSession, d: str) -> DataFrame:
        from seekstorm_spark.query.spell import (
            build_spell_dictionary,
            has_spell,
            spell_correct,
        )

        store = _wand_store(s, d)
        if not has_spell(store):
            build_spell_dictionary(s, store)
        rows = []
        for w in ["fastt", "tabel", "strem"]:
            c = spell_correct(store, w)
            rows.append((w, c[0] if c else None))
        return s.createDataFrame(rows, "word string, correction string")

    q["spell_correct"] = spell_correct_q

    def _ensure_bigram_completions(s: SparkSession, d: str):
        """Completion dictionary with tokenizer_lite MULTI-GRAMS
        (reference tokenizer.rs:1393-1668) — built once per store."""
        import os

        from seekstorm_spark.query.spell import build_completion_dictionary

        store = _wand_store(s, d)
        marker = os.path.join(store.path, "completions", "_BIGRAMS")
        if not os.path.exists(marker):
            build_completion_dictionary(s, store, docs=_docs(s, d))
            with open(marker, "w") as f:
                f.write("1")
        return store

    def qac_suggest(s: SparkSession, d: str) -> DataFrame:
        from seekstorm_spark.query.spell import complete

        store = _ensure_bigram_completions(s, d)
        sugg = complete(store, "st", k=5)
        rows = [(i + 1, t) for i, (t, _df) in enumerate(sugg)]
        return s.createDataFrame(rows, "rank long, term string")

    q["qac_suggest"] = qac_suggest

    def qac_suggest_bigram(s: SparkSession, d: str) -> DataFrame:
        from seekstorm_spark.query.spell import complete

        store = _ensure_bigram_completions(s, d)
        sugg = complete(store, "fast t", k=5)
        rows = [(i + 1, t) for i, (t, _df) in enumerate(sugg)]
        return s.createDataFrame(rows, "rank long, term string")

    q["qac_suggest_bigram"] = qac_suggest_bigram

    # index-time synonym expansion (multi-way fast<->stream; reference
    # Synonym struct index.rs:1077-1098, expansion index.rs:5869-5897)
    def wand_synonym(s: SparkSession, d: str) -> DataFrame:
        import json
        import os

        from seekstorm_spark.index.builder import (
            INDEX_FORMAT_VERSION,
            IndexBuilder,
        )
        from seekstorm_spark.index.store import IndexStore
        from seekstorm_spark.query.engine import search

        name = os.path.basename(d.rstrip("/")) or "sf"
        path = f"/tmp/seekstorm_wandsyn_idx_{name}"
        meta = os.path.join(path, "meta.json")
        store = None
        if os.path.exists(meta):
            with open(meta) as f:
                m = json.load(f)
            if m.get("complete") and m.get("version") == INDEX_FORMAT_VERSION \
                    and m.get("synonyms"):
                store = IndexStore.open(path)
        if store is None:
            store = IndexBuilder(
                s,
                path,
                n_buckets=8,
                synonyms=[{"terms": ["fast", "stream"], "multiway": True}],
            ).build(_docs(s, d), text_col="text", id_col="doc_id")
        out = search(s, store, "fast", top_k=10, default_type="union")
        return out.select(
            "docid", F.round(F.col("score").cast("double"), 4).alias("score")
        )

    q["wand_synonym"] = wand_synonym

    # facet filter + multi-key result sort INSIDE the indexed engine
    # (reference search.rs:2543-2726 facet pushdown, min_heap.rs:56-546
    # composite sort keys)
    def wand_facet_filter(s: SparkSession, d: str) -> DataFrame:
        from seekstorm_spark.query.engine import search

        store = _wand_store(s, d)
        out = search(
            s, store, "fast table", top_k=10, default_type="union",
            facet_filters={"lang": ["en"]},
        )
        return out.select(
            "docid", F.round(F.col("score").cast("double"), 4).alias("score")
        )

    q["wand_facet_filter"] = wand_facet_filter

    def wand_facet_sort(s: SparkSession, d: str) -> DataFrame:
        from seekstorm_spark.query.engine import search

        store = _wand_store(s, d)
        out = search(
            s, store, "fast", top_k=20, default_type="union",
            result_sort=[("lang", "asc"), ("score", "desc")],
        )
        return out.select(
            "docid",
            "lang",
            F.round(F.col("score").cast("double"), 4).alias("score"),
        )

    q["wand_facet_sort"] = wand_facet_sort

    # indexed multi-field BM25F (2-field index: text + source, boosts
    # 1.0/2.0; reference add_result.rs:1171-1426, search.rs:2483-2495)
    q["wand_bm25f_two_fields"] = _wandf_query(
        "fast src3", "union", [("text", 1.0), ("source", 2.0)]
    )
    q["wand_bm25f_field_filter"] = _wandf_query(
        "fast src3",
        "union",
        [("text", 1.0), ("source", 2.0)],
        field_filter=["source"],
    )

    def wand_count_and(s: SparkSession, d: str) -> DataFrame:
        from seekstorm_spark.query.engine import count_matches

        store = _wand_store(s, d)
        n = count_matches(s, store, "fast table", "intersection")
        return s.createDataFrame([(n,)], "matches long")

    q["wand_count_and"] = wand_count_and

    # batched counts: N queries, one fused kernel action (df
    # shortcuts answer driver-side with zero jobs)
    def wand_multi_count(s: SparkSession, d: str) -> DataFrame:
        from seekstorm_spark.query.engine import count_matches_many

        store = _wand_store(s, d)
        ns = count_matches_many(s, store, list(_MQ_QUERIES))
        return s.createDataFrame(
            [(i, int(n)) for i, n in enumerate(ns)],
            "query_id int, matches long",
        )

    q["wand_multi_count"] = wand_multi_count

    # batched facet counting: N queries' facet-value tallies fused
    # into ONE action — the blocks' facet buffers decode once and
    # every query's candidate set tallies against the shared arrays
    # (reference counts facets during result collection,
    # add_result.rs:487-646; server-side concurrent queries share the
    # same in-RAM facet columns)
    def wand_multi_facet_count(s: SparkSession, d: str) -> DataFrame:
        from seekstorm_spark.query.engine import facet_counts_many

        store = _wand_store(s, d)
        out = facet_counts_many(
            s,
            store,
            [
                ("fast", ["lang"]),
                ("+fast +table", ["lang"]),
                ("fast -dup", ["lang"]),
            ],
        )
        return out.select(
            "query_id", "facet", "value", F.col("n").cast("long").alias("n")
        )

    q["wand_multi_facet_count"] = wand_multi_facet_count

    # per-query facet FILTERS in the fused batch: each query carries
    # its own predicate (string dictionary / numeric range / none),
    # applied inside the one shared kernel
    def wand_multi_facet_filter(s: SparkSession, d: str) -> DataFrame:
        from seekstorm_spark.query.engine import search_many

        store = _wand_store(s, d)
        out = search_many(
            s,
            store,
            ["fast table", "fast", "key value"],
            top_k=10,
            facet_filters=[
                {"lang": ["en", "fr"]},
                {"n_chars": (100, 300)},
                None,
            ],
        )
        return out.select(
            "query_id", "docid",
            F.round(F.col("score").cast("double"), 4).alias("score"),
        )

    q["wand_multi_facet_filter"] = wand_multi_facet_filter

    # per-query GEO filters in the fused batch (haversine against the
    # shared per-block lat/lon buffers)
    def wand_multi_geo(s: SparkSession, d: str) -> DataFrame:
        from seekstorm_spark.query.engine import search_many

        store = _wandgeo_store(s, d)
        out = search_many(
            s,
            store,
            ["fast", "fast table"],
            top_k=10,
            geo_filters=[dict(_GEO_FILTER), None],
        )
        return out.select(
            "query_id", "docid",
            F.round(F.col("score").cast("double"), 4).alias("score"),
        )

    q["wand_multi_geo"] = wand_multi_geo

    # distance-SORTED results inside the fused batch: per-query
    # distance top-k heaps ride the same single action (asc and desc
    # directions, different radii) — bit-identical to the single-query
    # emit-all path (gated in tests/test_kernel_features.py)
    def wand_multi_geo_sort(s: SparkSession, d: str) -> DataFrame:
        from seekstorm_spark.query.engine import search_many

        store = _wandgeo_store(s, d)
        far = dict(_GEO_FILTER)
        far["radius_km"] = 9000.0
        out = search_many(
            s,
            store,
            ["fast", "fast table"],
            top_k=10,
            geo_filters=[dict(_GEO_FILTER), far],
            result_sorts=[[("geo_dist", "asc")], [("geo_dist", "desc")]],
        )
        return out.select(
            "query_id", "docid",
            F.round(F.col("geo_dist"), 4).alias("geo_dist"),
        )

    q["wand_multi_geo_sort"] = wand_multi_geo_sort

    # per-query numeric RANGE facet tallies in the fused batch —
    # different bucket sets per query, one action, cumulative mode
    def wand_multi_facet_range(s: SparkSession, d: str) -> DataFrame:
        from seekstorm_spark.query.engine import facet_range_counts_many

        store = _wand_store(s, d)
        out = facet_range_counts_many(
            s,
            store,
            [
                ("fast", {"n_chars": [0.0, 100.0, 200.0, 300.0]}),
                ("+fast +table", {"n_chars": [0.0, 150.0]}),
            ],
            cumulative=True,
        )
        return out.select(
            "query_id", "facet", "bucket_lo",
            F.col("n").cast("long").alias("n"),
            F.col("n_cumulative").cast("long").alias("n_cumulative"),
        )

    q["wand_multi_facet_range"] = wand_multi_facet_range

    # index-level facet stats: value counts over ALL docs from the
    # per-block facet arrays alone — no query, no postings read
    # (reference get_index_string_facets, index.rs:4407-4458)
    def wand_index_facet_stats(s: SparkSession, d: str) -> DataFrame:
        from seekstorm_spark.query.engine import index_facet_stats

        store = _wand_store(s, d)
        return index_facet_stats(s, store, ["lang"]).select(
            "facet", "value", F.col("n").cast("long").alias("n")
        )

    q["wand_index_facet_stats"] = wand_index_facet_stats

    # filtered counting: exact match count under facet predicates
    # (the reference counts within filters, search.rs:168-176 +
    # facet filtering in the same pass)
    def wand_count_filtered(s: SparkSession, d: str) -> DataFrame:
        from seekstorm_spark.query.engine import count_matches

        store = _wand_store(s, d)
        n = count_matches(
            s, store, "fast",
            facet_filters={"lang": ["en", "fr"], "n_chars": (100, 300)},
        )
        return s.createDataFrame([(int(n),)], "matches long")

    q["wand_count_filtered"] = wand_count_filtered

    q["count_and"] = lambda s, d: _match_count_df(
        s, _docs(s, d), ["fast", "table"], "intersection"
    )
    q["count_or"] = lambda s, d: _match_count_df(
        s, _docs(s, d), ["fast", "table"], "union"
    )
    q["count_phrase"] = lambda s, d: _match_count_df(
        s, _docs(s, d), ["fast", "table"], "phrase", phrase=["fast", "table"]
    )

    # union inclusion–exclusion invariant (reference union.rs:1236-1248).
    # ONE tokenize pass + ONE action (formerly three counted actions,
    # each re-tokenizing, + an RDD-backed literal result): per-doc
    # membership flags from the shared term-row pass, then a single
    # global aggregation computes n_a / n_b / n_and; n_or is the
    # inclusion–exclusion identity over those integers — same values.
    def union_incl_excl(s: SparkSession, d: str) -> DataFrame:
        from seekstorm_spark.query.dataframe_engine import query_term_rows

        rows = query_term_rows(_docs(s, d), ["fast", "table"])
        per = (
            rows.filter(F.col("term").isin(["fast", "table"]))
            .groupBy("docid")
            .agg(
                F.max(
                    F.when(F.col("term") == "fast", 1).otherwise(0)
                ).alias("ha"),
                F.max(
                    F.when(F.col("term") == "table", 1).otherwise(0)
                ).alias("hb"),
            )
        )
        return per.agg(
            F.sum("ha").cast("long").alias("n_a"),
            F.sum("hb").cast("long").alias("n_b"),
            F.sum(F.col("ha") * F.col("hb")).cast("long").alias("n_and"),
        ).select(
            "n_a",
            "n_b",
            "n_and",
            (F.col("n_a") + F.col("n_b") - F.col("n_and"))
            .cast("long")
            .alias("n_or"),
        )

    q["count_union_incl_excl"] = union_incl_excl

    # --- facets / sorts / browse (SURVEY §2.3, §2.5, §2.6) ---
    def facet_lang(s: SparkSession, d: str) -> DataFrame:
        docs = _docs(s, d)
        matching = (
            tokens(docs).filter(F.col("term") == "fast").select("docid").distinct()
        )
        return (
            docs.join(matching, docs.doc_id == matching.docid)
            .groupBy("lang")
            .agg(F.count("*").cast("long").alias("n"))
        )

    q["facet_count_lang"] = facet_lang
    q["facet_range_nchars"] = lambda s, d: (
        _docs(s, d)
        .withColumn(
            "bucket",
            F.when(F.col("n_chars") < 100, "0-99")
            .when(F.col("n_chars") < 200, "100-199")
            .when(F.col("n_chars") < 300, "200-299")
            .otherwise("300+"),
        )
        .groupBy("bucket")
        .agg(F.count("*").cast("long").alias("n"))
    )
    # cumulative range facet counts (CountWithinRange mode,
    # reference search.rs:3598-3764 cumulative sums)
    def facet_range_cumulative(s: SparkSession, d: str) -> DataFrame:
        from pyspark.sql.window import Window

        base = (
            _docs(s, d)
            .withColumn("bucket_lo", (F.col("n_chars") / 100).cast("int") * 100)
            .groupBy("bucket_lo")
            .agg(F.count("*").cast("long").alias("n"))
        )
        w = Window.orderBy("bucket_lo").rowsBetween(
            Window.unboundedPreceding, Window.currentRow
        )
        return base.select(
            "bucket_lo",
            "n",
            F.sum("n").over(w).cast("long").alias("n_cumulative"),
        )

    q["facet_range_cumulative"] = facet_range_cumulative
    q["facet_minmax"] = lambda s, d: (
        _docs(s, d)
        .groupBy("lang")
        .agg(
            F.min("n_chars").cast("long").alias("min_chars"),
            F.max("n_chars").cast("long").alias("max_chars"),
        )
    )

    def multikey_sort(s: SparkSession, d: str) -> DataFrame:
        docs = _docs(s, d)
        scored = bm25_scored(s, docs, ["dup"], "union").withColumn(
            "score", F.round(F.col("score"), 4)
        )
        return (
            docs.join(scored, docs.doc_id == scored.docid)
            .select("doc_id", "lang", "score")
            .orderBy(
                F.col("lang").asc(), F.col("score").desc(), F.col("doc_id").asc()
            )
            .limit(20)
        )

    q["multikey_sort"] = multikey_sort
    q["delete_filter"] = lambda s, d: bm25_topk(
        s,
        _docs(s, d).filter(F.col("doc_id") % 7 != 0),
        ["fast", "table"],
        "intersection",
    )

    def get_document(s: SparkSession, d: str) -> DataFrame:
        docs = _docs(s, d)
        top = bm25_topk(s, docs, ["fast", "table"], "intersection", top_k=5)
        return top.join(docs, top.docid == docs.doc_id).select(
            "doc_id", "score", "lang", "source", "n_chars"
        )

    q["get_document"] = get_document

    # columnar doc store: bucketed parquet + driver-side pyarrow
    # row-group cache (reference doc_store.rs) — the point lookups
    # themselves run with NO Spark job; only the result re-enters
    # Spark for the driver's comparison
    def doc_store_get(s: SparkSession, d: str) -> DataFrame:
        import json
        import os

        from seekstorm_spark.query.docstore import (
            DOC_STORE_VERSION,
            DocStore,
            write_doc_store,
        )

        name = os.path.basename(d.rstrip("/")) or "sf"
        path = f"/tmp/seekstorm_docstore_{name}"
        meta = os.path.join(path, "_docstore_meta.json")
        ok = False
        if os.path.exists(meta):
            with open(meta) as f:
                ok = json.load(f).get("version") == DOC_STORE_VERSION
        if not ok:
            write_doc_store(
                _docs(s, d).select("doc_id", "lang", "source", "n_chars"),
                path,
                id_col="doc_id",
                docs_per_bucket=4096,
            )
        ds = DocStore(path)
        rows = [
            r for r in ds.get_many([3, 17, 101, 250, 10**9]) if r is not None
        ]
        return s.createDataFrame(
            [
                (r["docid"], r["lang"], r["source"], int(r["n_chars"]))
                for r in rows
            ],
            "docid long, lang string, source string, n_chars long",
        )

    q["doc_store_get"] = doc_store_get

    # fvecs ingest: embeddings → TEXMEX .fvecs bytes → read_fvecs —
    # per-vector float32 components must survive the round-trip
    # bit-exactly (the public SIFT/GIST corpus layout the reference's
    # vector side consumes)
    def ingest_fvecs(s: SparkSession, d: str) -> DataFrame:
        import os

        import numpy as np
        import pyarrow.parquet as pq

        from seekstorm_spark.sources.vecs import (
            read_fvecs,
            write_vecs_file,
        )

        name = os.path.basename(d.rstrip("/")) or "sf"
        path = f"/tmp/seekstorm_fvecs_{name}.fvecs"
        if not os.path.exists(path):
            t = pq.read_table(
                os.path.join(d, "embeddings.parquet"),
                columns=["vec_id", "embedding"],
            ).to_pandas().sort_values("vec_id")
            write_vecs_file(
                [np.asarray(v, dtype=np.float32) for v in t["embedding"]],
                path + ".tmp",
                "f",
            )
            os.replace(path + ".tmp", path)
        out = read_fvecs(s, path)
        return out.select(
            F.col("idx").alias("vec_id"),
            F.size("vec").alias("dim"),
            F.element_at("vec", 1).cast("double").alias("c0"),
            F.element_at("vec", -1).cast("double").alias("clast"),
        )

    q["ingest_fvecs"] = ingest_fvecs

    # HTML ingest: wrap each doc's text in a page, extract it back —
    # the input-contract invariant (byte-identical extracted text per
    # row) through the Arrow-batched stripper
    def ingest_html_extract(s: SparkSession, d: str) -> DataFrame:
        from seekstorm_spark.sources.webtext import extract_text

        wrapped = _docs(s, d).select("doc_id", "text").withColumn(
            "html",
            F.encode(
                F.concat(
                    F.lit(
                        "<html><head><title>t</title>"
                        "<style>p{margin:0}</style></head><body><p>"
                    ),
                    F.col("text"),
                    F.lit("</p><!-- footer --></body></html>"),
                ),
                "utf-8",
            ),
        )
        return extract_text(wrapped, "html", "extracted").select(
            "doc_id", F.col("extracted").alias("text")
        )

    q["ingest_html_extract"] = ingest_html_extract

    # WARC acquisition (sources/warc.py): documents wrapped into a
    # deterministic 2-file gzipped WARC fixture on first call, then
    # read back via the binaryFile + Arrow-batched record parser and
    # text-extracted — url/date/status survive the round trip and the
    # extracted text is byte-identical to the source column.
    def ingest_warc(s: SparkSession, d: str) -> DataFrame:
        import os

        from seekstorm_spark.sources.warc import build_warc
        from seekstorm_spark.sources.warc import read_warc
        from seekstorm_spark.sources.webtext import extract_text

        name = os.path.basename(d.rstrip("/")) or "sf"
        path = f"/tmp/seekstorm_warc_{name}"
        marker = os.path.join(path, "part1.warc.gz")
        if not os.path.exists(marker):
            os.makedirs(path, exist_ok=True)
            rows = (
                _docs(s, d)
                .select("doc_id", "text")
                .filter(F.col("doc_id") < 200)
                .orderBy("doc_id")
                .collect()
            )
            import datetime as dt

            epoch = dt.datetime(2026, 1, 1, tzinfo=dt.timezone.utc)
            recs = [
                {
                    "url": f"http://crawl.test/{r['doc_id']:06d}",
                    "html": "<html><head><title>t</title></head><body><p>"
                    + r["text"]
                    + "</p><!-- c --></body></html>",
                    "date": epoch + dt.timedelta(seconds=int(r["doc_id"])),
                }
                for r in rows
            ]
            mid = len(recs) // 2
            for i, chunk in enumerate((recs[:mid], recs[mid:])):
                tmp = os.path.join(path, f".part{i}.tmp")
                with open(tmp, "wb") as f:
                    f.write(build_warc(chunk, gzip_members=True))
                os.replace(tmp, os.path.join(path, f"part{i}.warc.gz"))
        crawl = read_warc(s, path)
        return extract_text(crawl, "html", "extracted").select(
            "url",
            F.date_format(
                "warc_ts", "yyyy-MM-dd'T'HH:mm:ss'Z'"
            ).alias("warc_date"),
            "http_status",
            F.col("extracted").alias("text"),
        )

    q["ingest_warc"] = ingest_warc

    # PDF acquisition (sources/pdf.py — reference ingest.rs:79-545
    # PDF path): documents serialized into 3 multi-page PDF fixtures
    # on first call (FlateDecode streams), then read back via the
    # binaryFile + mapInPandas page parser — text is byte-identical
    # to the source column, pages ride the page-tree order.
    def ingest_pdf(s: SparkSession, d: str) -> DataFrame:
        import os

        from seekstorm_spark.sources.pdf import build_pdf, read_pdf

        name = os.path.basename(d.rstrip("/")) or "sf"
        path = f"/tmp/seekstorm_pdf_{name}"
        per_file, n_files = 40, 3
        marker = os.path.join(path, f"part{n_files - 1}.pdf")
        if not os.path.exists(marker):
            os.makedirs(path, exist_ok=True)
            rows = (
                _docs(s, d)
                .select("doc_id", "text")
                .filter(F.col("doc_id") < per_file * n_files)
                .orderBy("doc_id")
                .collect()
            )
            for i in range(n_files):
                pages = [
                    r["text"]
                    for r in rows[i * per_file : (i + 1) * per_file]
                ]
                tmp = os.path.join(path, f".part{i}.tmp")
                with open(tmp, "wb") as f:
                    f.write(build_pdf(pages))
                os.replace(tmp, os.path.join(path, f"part{i}.pdf"))
        pages_df = read_pdf(s, path)
        return (
            pages_df.select(
                (
                    F.regexp_extract("pdf_file", r"part(\d+)\.pdf", 1)
                    .cast("long")
                    * per_file
                    + F.col("page")
                    - 1
                ).alias("doc_id"),
                "text",
            )
            .orderBy("doc_id")
        )

    q["ingest_pdf"] = ingest_pdf

    # PDF DOCUMENT ingest (reference index_pdf, ingest.rs:265-395):
    # one row per file with title/date from the /Info dictionary and
    # the reference's fallback chain — file 0 carries metadata, file 1
    # exercises the first-line title + default-date fallbacks, file 2
    # a timezone-offset date with a first-line title. The oracle
    # recomputes every field from the documents table.
    def ingest_pdf_meta(s: SparkSession, d: str) -> DataFrame:
        import os

        from seekstorm_spark.sources.pdf import build_pdf, read_pdf_docs

        name = os.path.basename(d.rstrip("/")) or "sf"
        path = f"/tmp/seekstorm_pdfdoc_{name}"
        if not os.path.exists(os.path.join(path, "f2.pdf")):
            os.makedirs(path, exist_ok=True)
            rows = (
                _docs(s, d)
                .select("doc_id", "text")
                .filter(F.col("doc_id") < 15)
                .orderBy("doc_id")
                .collect()
            )
            texts = [r["text"] for r in rows]
            spec = [
                ("f0.pdf", texts[0:5],
                 dict(title="Meta Title Zero",
                      creation_date="D:20200101000000Z")),
                ("f1.pdf", texts[5:10], {}),
                ("f2.pdf", texts[10:15],
                 dict(creation_date="D:20240102030405+02'00")),
            ]
            for fname, pages, kw in spec:
                tmp = os.path.join(path, f".{fname}.tmp")
                with open(tmp, "wb") as f:
                    f.write(build_pdf(pages, **kw))
                os.replace(tmp, os.path.join(path, fname))
        return (
            read_pdf_docs(s, path, default_date=1111)
            .select(
                F.element_at(F.split("pdf_file", "/"), -1).alias("fname"),
                "title",
                F.col("date").alias("ts"),
                F.length("text").cast("long").alias("n_chars"),
            )
            .orderBy("fname")
        )

    q["ingest_pdf_meta"] = ingest_pdf_meta
    q["iterator_skip_take"] = lambda s, d: (
        _docs(s, d)
        .orderBy(F.col("doc_id").asc())
        .offset(100)
        .limit(25)
        .select("doc_id", "source", "n_chars")
    )
    q["empty_query_facets"] = lambda s, d: (
        _docs(s, d).groupBy("source").agg(F.count("*").cast("long").alias("n"))
    )

    # --- dedup (training-data ops) ---
    q["dedup_fingerprint"] = lambda s, d: (
        _docs(s, d)
        .filter(F.col("doc_id") < 30)
        .select("doc_id", doc_fingerprint(F.col("text")).alias("fingerprint"))
    )
    q["dedup_exact_groups"] = lambda s, d: exact_dup_groups(_docs(s, d))
    q["dedup_jaccard_pairs"] = lambda s, d: jaccard_pairs(
        _docs(s, d).filter(F.col("doc_id") < 60), threshold=0.01
    )
    # C4 quality filters (functions/c4.py — Raffel et al. 2020 §2.2):
    # the corpus text has no line structure, so lines / terminal
    # punctuation / javascript / lorem / brace triggers are
    # synthesized via literal replace chains that DuckDB mirrors
    # verbatim (replace-all, left-to-right on both engines).
    def quality_c4(s: SparkSession, d: str) -> DataFrame:
        from seekstorm_spark.functions.c4 import c4_clean

        i = F.col("doc_id")
        t = F.replace(F.col("text"), F.lit(" merge "), F.lit(".\n"))
        t = F.replace(t, F.lit(" window "), F.lit("\n"))
        t = F.replace(t, F.lit(" stream "), F.lit(" javascript.\n"))
        t = F.when(i % 11 == 0, F.concat(t, F.lit("\nlorem ipsum dolor sit."))).otherwise(t)
        t = F.when(i % 7 == 3, F.concat(t, F.lit("\ncode { brace }."))).otherwise(t)
        t = F.concat(t, F.lit("."))
        return (
            c4_clean(
                _docs(s, d).filter(i < 300).select("doc_id", t.alias("text"))
            )
            .select(
                "doc_id", "c4_text", "c4_n_lines", "c4_n_sentences", "c4_keep"
            )
            .orderBy("doc_id")
        )

    q["quality_c4"] = quality_c4

    # URL canonicalization (functions/urlnorm.py — beyond-reference
    # web-pipeline op): messy URLs are synthesized deterministically
    # from doc_id (case noise, default/explicit ports, tracking
    # params, fragments, unsorted query) so both engines canonicalize
    # the identical inputs; the oracle mirrors every regex verbatim
    # (Java ∩ RE2 syntax, pii.py policy).
    def url_canonicalize(s: SparkSession, d: str) -> DataFrame:
        from seekstorm_spark.functions.urlnorm import (
            canonicalize_url,
            url_host,
        )

        i = F.col("doc_id")
        url = F.concat(
            F.when(i % 2 == 0, F.lit("HTTP")).otherwise(F.lit("https")),
            F.lit("://Host"),
            (i % 7).cast("string"),
            F.lit(".Example.COM"),
            F.when(i % 4 == 0, F.lit(":80"))
            .when(i % 4 == 1, F.lit(":443"))
            .when(i % 4 == 2, F.lit(":8080"))
            .otherwise(F.lit("")),
            F.when(i % 3 == 0, F.lit("")).otherwise(
                F.concat(F.lit("/Dir/"), i.cast("string"))
            ),
            F.lit("?utm_source=feed&b="),
            (i % 5).cast("string"),
            F.lit("&a=1"),
            F.when(i % 6 == 0, F.lit("&gclid=XyZ")).otherwise(F.lit("")),
            F.when(i % 2 == 1, F.concat(F.lit("#Sec"), i.cast("string")))
            .otherwise(F.lit("")),
        )
        return (
            _docs(s, d)
            .filter(i < 200)
            .select("doc_id", url.alias("url"))
            .select(
                "doc_id",
                "url",
                canonicalize_url("url").alias("canon"),
                url_host("url").alias("host"),
            )
            .orderBy("doc_id")
        )

    q["url_canonicalize"] = url_canonicalize

    # CCNet-style LM quality scoring (functions/lm.py): corpus-trained
    # add-one bigram model, per-doc mean -ln p(w2|w1). f32 log-probs
    # sorted then folded sequentially in f64 → bit-deterministic on
    # both engines (same trick as the BM25 idf path).
    def quality_bigram_nll(s: SparkSession, d: str) -> DataFrame:
        from seekstorm_spark.functions.lm import bigram_nll

        return bigram_nll(_docs(s, d)).orderBy("docid")

    q["quality_bigram_nll"] = quality_bigram_nll

    # deterministic training-mixture sampling (functions/sampling.py):
    # per-language keep rates as exact binary fractions, decided by a
    # 60-bit md5 content hash both engines compute identically.
    def sample_stratified(s: SparkSession, d: str) -> DataFrame:
        from seekstorm_spark.functions.sampling import stratified_sample

        rates = {"en": 0.5, "de": 0.25, "fr": 0.125, "es": 1.0, "zh": 0.0625}
        return (
            stratified_sample(_docs(s, d), rates)
            .select("doc_id", "lang")
            .orderBy("doc_id")
        )

    q["sample_stratified"] = sample_stratified

    # GPT-style sequence packing (concat-then-chunk per language
    # group): pack_id/pack_offset of each doc's first token under a
    # 200-token window — one window function per group, no global sort.
    def pack_docs(s: SparkSession, d: str) -> DataFrame:
        from seekstorm_spark.functions.sampling import pack_sequences

        n_toks = F.size(
            F.filter(
                F.split(F.trim(F.lower(F.col("text"))), r"\s+"),
                lambda w: w != "",
            )
        ).cast("long")
        docs = _docs(s, d).select("doc_id", "lang", n_toks.alias("n_tokens"))
        return (
            pack_sequences(
                docs, "n_tokens", budget=200, group_col="lang",
                order_col="doc_id",
            )
            .select("doc_id", "lang", "n_tokens", "pack_id", "pack_offset")
            .orderBy("doc_id")
        )

    q["pack_sequences"] = pack_docs

    # exact-substring span dedup (dedup.duplicate_spans — Lee et al.
    # 2022 simplified to token n-grams): merged per-doc token ranges
    # covered by a 3-gram occurring in ≥2 docs; the oracle mirrors the
    # gaps-and-islands window merge with SQL window functions.
    def dedup_spans(s: SparkSession, d: str) -> DataFrame:
        from seekstorm_spark.functions.dedup import duplicate_spans

        return duplicate_spans(
            _docs(s, d).filter(F.col("doc_id") < 80), n=3
        ).orderBy("docid", "span_start")

    q["dedup_spans"] = dedup_spans

    # pair → cluster step: Jaccard candidate pairs → connected
    # components via alternating large-star/small-star (O(log² n)
    # DataFrame rounds, dedup.py). component = min reachable doc_id;
    # the DuckDB oracle computes the same fixpoint with a recursive
    # reachability CTE.
    def dedup_components(s: SparkSession, d: str) -> DataFrame:
        from seekstorm_spark.functions.dedup import connected_components

        pairs = jaccard_pairs(
            _docs(s, d).filter(F.col("doc_id") < 60), threshold=0.01
        )
        return connected_components(pairs).orderBy("docid")

    q["dedup_components"] = dedup_components
    q["dedup_simhash"] = lambda s, d: (
        _docs(s, d)
        .filter(F.col("doc_id") < 30)
        .select("doc_id", simhash_udf(F.col("text")).alias("simhash"))
    )
    def dedup_minhash_sig(s: SparkSession, d: str) -> DataFrame:
        from seekstorm_spark.functions.dedup import _minhash_udf

        return (
            _docs(s, d)
            .filter(F.col("doc_id") < 30)
            .select(
                "doc_id", F.posexplode(_minhash_udf(F.col("text"))).alias("i", "mh")
            )
            .select("doc_id", F.col("i").cast("long").alias("i"), "mh")
        )

    # embedding-cosine near-dup pairs via the LSH SCALE path: banded
    # hyperplane signatures → (band, bucket) equi-join candidates →
    # exact float64 verification. No all-pairs stage anywhere (the
    # all-pairs twin cross-checks this row in pytest). The synthetic
    # embeddings have max pairwise cosine ~0.51, so near-dups are
    # PLANTED deterministically: each vector gets a jittered copy at
    # vec_id+10000 (integer-hash perturbation, cos ≈ 0.996) — a regime
    # sign-LSH genuinely covers (p=1−θ/π ≈ 0.97/plane; miss < 1e-5 at
    # 8 bands × 8 rows); threshold 0.9 keeps exactly the planted pairs.
    def dedup_embedding_pairs(s: SparkSession, d: str) -> DataFrame:
        from seekstorm_spark.functions.simsearch import cosine_near_dup_lsh

        return cosine_near_dup_lsh(
            _emb_with_dups(s, d), dim=64, id_col="vec_id",
            vec_col="embedding", threshold=0.9, bands=8, rows_per_band=8,
        ).select(
            "id_a", "id_b", F.round(F.col("cosine"), 4).alias("cosine")
        )

    q["dedup_embedding_pairs"] = dedup_embedding_pairs

    # benchmark decontamination: training docs sharing a 4-token
    # shingle with the probe (benchmark) subset — broadcast inverted-
    # index join, no all-pairs
    def decontaminate_overlap(s: SparkSession, d: str) -> DataFrame:
        from seekstorm_spark.functions.dedup import contamination_pairs

        docs = _docs(s, d)
        probes = docs.filter(F.col("doc_id") % 13 == 0)
        return (
            contamination_pairs(docs, probes, n=4)
            .filter(F.col("docid") != F.col("probe_id"))
            .select(
                F.col("docid").cast("long").alias("doc_id"),
                F.col("probe_id").cast("long").alias("probe_id"),
                "n_common",
            )
        )

    q["decontaminate_overlap"] = decontaminate_overlap

    q["dedup_minhash_sig"] = dedup_minhash_sig

    # incremental crawl dedup: persist the corpus's band rows ONCE,
    # probe each new batch against them — O(batch) per batch, the
    # 100-TB shape (never re-shingle the corpus). The planted copies
    # (+100000) collide on every band; organic near-dups may add more.
    def dedup_incremental(s: SparkSession, d: str) -> DataFrame:
        import os

        from seekstorm_spark.functions.dedup import (
            probe_minhash_store,
            write_minhash_store,
        )

        name = os.path.basename(d.rstrip("/")) or "sf"
        path = f"/tmp/seekstorm_mhstore_v1_{name}"
        docs = _docs(s, d)
        if not os.path.exists(os.path.join(path, "_SUCCESS")):
            write_minhash_store(docs.filter(F.col("doc_id") < 100), path)
        batch = (
            docs.filter((F.col("doc_id") >= 100) & (F.col("doc_id") < 160))
            .select("doc_id", "text")
            .unionByName(
                docs.filter(F.col("doc_id") < 30).select(
                    (F.col("doc_id") + 100000).alias("doc_id"), "text"
                )
            )
        )
        return probe_minhash_store(s, path, batch).orderBy(
            "batch_docid", "corpus_docid"
        )

    q["dedup_incremental_minhash"] = dedup_incremental

    # robots.txt crawl filtering (RFC 9309, functions/robots.py): the
    # Spark side parses real robots documents and evaluates the
    # longest-match/allow-wins precedence through the broadcast-join
    # UDF; the oracle replays the same precedence over the rule
    # prefixes in SQL. Host h4 has no robots row (⇒ allowed).
    def crawl_robots_filter(s: SparkSession, d: str) -> DataFrame:
        from seekstorm_spark.functions.robots import filter_by_robots

        i5 = (F.col("doc_id") % 5).cast("int").cast("string")
        did = F.col("doc_id").cast("string")
        host = F.concat(F.lit("h"), i5)
        path = (
            F.when(
                F.col("doc_id") % 3 == 0,
                F.concat(F.lit("/d"), i5, F.lit("/okpage"), did),
            )
            .when(
                F.col("doc_id") % 3 == 1,
                F.concat(F.lit("/d"), i5, F.lit("/x"), did),
            )
            .otherwise(F.concat(F.lit("/free/"), did))
        )
        pages = (
            _docs(s, d)
            .filter(F.col("doc_id") < 200)
            .select(
                "doc_id",
                host.alias("host"),
                F.concat(
                    F.lit("http://"), host, F.lit(".test"), path
                ).alias("url"),
            )
        )
        robots = s.createDataFrame(
            [
                (
                    f"h{i}",
                    f"User-agent: *\nDisallow: /d{i}/\nAllow: /d{i}/ok\n",
                )
                for i in range(4)
            ],
            "host string, robots_txt string",
        )
        return (
            filter_by_robots(pages, robots, keep_flag=True)
            .select("doc_id", "allowed")
            .orderBy("doc_id")
        )

    q["crawl_robots_filter"] = crawl_robots_filter

    # sitemap acquisition (sources/sitemap.py, sitemaps.org protocol):
    # urlset + gzipped urlset + sitemapindex fixtures round-trip
    # through binaryFile + the Arrow-batched parser; lastmod dates and
    # the None-lastmod rows are derived from doc_id on both sides.
    def ingest_sitemap(s: SparkSession, d: str) -> DataFrame:
        import os
        from datetime import date, timedelta

        from seekstorm_spark.sources.sitemap import (
            build_sitemap,
            read_sitemaps,
        )

        name = os.path.basename(d.rstrip("/")) or "sf"
        path = f"/tmp/seekstorm_sitemap_{name}"
        if not os.path.exists(os.path.join(path, "smindex.xml")):
            os.makedirs(path, exist_ok=True)
            ids = sorted(
                r["doc_id"]
                for r in _docs(s, d)
                .filter(F.col("doc_id") < 120)
                .select("doc_id")
                .collect()
            )

            def lastmod(i: int) -> str | None:
                if i >= 60 and i % 4 == 0:
                    return None
                return (date(2024, 1, 1) + timedelta(days=int(i))).strftime(
                    "%Y-%m-%d"
                )

            files = [
                ("sm0.xml", [
                    (f"http://site.test/page{i}", lastmod(i))
                    for i in ids if i < 60
                ], False),
                ("sm1.xml.gz", [
                    (f"http://site.test/page{i}", lastmod(i))
                    for i in ids if i >= 60
                ], True),
            ]
            for fname, entries, gz in files:
                tmp = os.path.join(path, f".{fname}.tmp")
                with open(tmp, "wb") as f:
                    f.write(build_sitemap(entries, compress=gz))
                os.replace(tmp, os.path.join(path, fname))
            idx = build_sitemap(
                [
                    ("http://site.test/sm0.xml", "2024-06-01"),
                    ("http://site.test/sm1.xml.gz", "2024-06-01"),
                ],
                index=True,
            )
            tmp = os.path.join(path, ".smindex.xml.tmp")
            with open(tmp, "wb") as f:
                f.write(idx)
            os.replace(tmp, os.path.join(path, "smindex.xml"))
        return (
            read_sitemaps(s, path)
            .select("kind", "loc", "lastmod")
            .orderBy("kind", "loc")
        )

    q["ingest_sitemap"] = ingest_sitemap
    q["dedup_minhash_candidates"] = lambda s, d: minhash_lsh_pairs(
        _docs(s, d).filter(F.col("doc_id") < 60)
    ).orderBy("docid_a", "docid_b")

    # --- similarity search ---
    def ann_query_vec(s: SparkSession, d: str) -> list[float]:
        # driver-side pyarrow point read (the engine's zero-job probe
        # pattern, cf. query/docstore.py): fetching ONE known row via
        # a Spark .first() costs a whole scheduled job (~0.2 s) inside
        # every ann_* query's timed region. Identical floats: same
        # parquet values, same float32 → float64 widening.
        import pyarrow.dataset as pads

        tbl = pads.dataset(f"{d}/embeddings.parquet").to_table(
            columns=["embedding"], filter=pads.field("vec_id") == 0
        )
        return [float(x) for x in tbl.column("embedding")[0].as_py()]

    q["ann_cosine_topk"] = lambda s, d: cosine_topk(
        _emb(s, d).filter(F.col("vec_id") != 0), ann_query_vec(s, d), k=10
    )

    # Dot and Euclidean similarities (reference
    # vector_similarity.rs:15-41 similarity enum)
    def ann_dot_topk(s: SparkSession, d: str) -> DataFrame:
        from seekstorm_spark.functions.simsearch import dot_topk

        return dot_topk(
            _emb(s, d).filter(F.col("vec_id") != 0), ann_query_vec(s, d),
            k=10,
        )

    q["ann_dot_topk"] = ann_dot_topk

    def ann_euclidean_topk(s: SparkSession, d: str) -> DataFrame:
        from seekstorm_spark.functions.simsearch import euclidean_topk

        return euclidean_topk(
            _emb(s, d).filter(F.col("vec_id") != 0), ann_query_vec(s, d),
            k=10,
        )

    q["ann_euclidean_topk"] = ann_euclidean_topk

    # 8-bit scalar quantization + search over the codes (reference SQ
    # path used in its SIFT/GIST benchmarks): per-vector scale =
    # max|x|/127, similarity computed on the i8 codes (scale cancels
    # in cosine)
    def ann_quantized_cosine(s: SparkSession, d: str) -> DataFrame:
        from seekstorm_spark.functions.simsearch import (
            quantize_i8,
            quantized_cosine_topk,
        )

        qv = ann_query_vec(s, d)
        codes = quantize_i8(_emb(s, d).filter(F.col("vec_id") != 0))
        return quantized_cosine_topk(codes, qv, k=10)

    q["ann_quantized_cosine"] = ann_quantized_cosine

    # affine (asymmetric min/max) 8-bit SQ — the reference's affine
    # SQ variant (vector_similarity.rs:1226+): per-vector zero point +
    # scale, cosine over the dequantized reconstruction
    def ann_affine_cosine(s: SparkSession, d: str) -> DataFrame:
        from seekstorm_spark.functions.simsearch import (
            affine_cosine_topk,
            quantize_u8_affine,
        )

        qv = ann_query_vec(s, d)
        codes = quantize_u8_affine(_emb(s, d).filter(F.col("vec_id") != 0))
        return affine_cosine_topk(codes, qv, k=10)

    q["ann_affine_cosine"] = ann_affine_cosine

    # TurboQuant: ±1 sign scramble + Fast Walsh-Hadamard rotation +
    # per-vector i8 SQ with scale = (sigma/32) (reference
    # vector_similarity.rs:1825-2090); cosine mode normalizes at index
    # time, similarity = integer dot of the codes × both scales
    def ann_turboquant_topk(s: SparkSession, d: str) -> DataFrame:
        from seekstorm_spark.functions.simsearch import (
            turboquant_topk,
            turboquant_vectors,
        )

        qv = ann_query_vec(s, d)
        tq = turboquant_vectors(
            _emb(s, d).filter(F.col("vec_id") != 0), dim=64
        )
        return turboquant_topk(tq, qv, k=10, similarity="cosine")

    q["ann_turboquant_topk"] = ann_turboquant_topk

    # Bm25fProximity — the reference's DEFAULT LexicalSimilarity
    # (index.rs:558-568, add_result.rs:917-941, NGRAM_SEARCH.md
    # "N-grams and BM25"): a phrase covered by an indexed gram scores
    # with the GRAM's df/tf instead of the partial terms', so term
    # adjacency is honored in relevance. Query-time option — shares
    # the cached wand_phrase_ngram index (no rebuild).
    def wand_phrase_proximity(s: SparkSession, d: str) -> DataFrame:
        import json
        import os

        from seekstorm_spark.index.builder import (
            INDEX_FORMAT_VERSION,
            IndexBuilder,
        )
        from seekstorm_spark.index.store import IndexStore
        from seekstorm_spark.query.engine import _plan, search

        name = os.path.basename(d.rstrip("/")) or "sf"
        path = f"/tmp/seekstorm_wandng_idx_{name}"
        meta = os.path.join(path, "meta.json")
        store = None
        if os.path.exists(meta):
            with open(meta) as f:
                m = json.load(f)
            if m.get("complete") and m.get("version") == INDEX_FORMAT_VERSION \
                    and m.get("frequent_terms"):
                store = IndexStore.open(path)
        if store is None:
            store = IndexBuilder(
                s, path, n_buckets=8, frequent_terms=["fast", "table"]
            ).build(_docs(s, d), text_col="text", id_col="doc_id")
        plan = _plan(
            s, store, '"fast table"', "union", similarity="bm25f_proximity"
        )
        assert plan.qtype == "ngram" and not plan.unit_parts
        out = search(
            s, store, '"fast table"', top_k=10, default_type="union",
            similarity="bm25f_proximity",
        )
        return out.select(
            "docid", F.round(F.col("score").cast("double"), 4).alias("score")
        )

    q["wand_phrase_proximity"] = wand_phrase_proximity

    def ann_lsh(s: SparkSession, d: str) -> DataFrame:
        import os

        from seekstorm_spark.functions.simsearch import AnnIndex

        name = os.path.basename(d.rstrip("/")) or "sf"
        path = f"/tmp/seekstorm_ann_idx_{name}"
        if os.path.exists(os.path.join(path, "meta.json")):
            idx = AnnIndex.open(path)
        else:
            idx = AnnIndex.build(
                s, _emb(s, d).filter(F.col("vec_id") != 0), path, n_planes=8
            )
        return idx.search(s, ann_query_vec(s, d), k=10, probe_hamming=1)

    # signature-partitioned ANN: the scan reads ONLY the probed sig=
    # partitions (hyperplanes are deterministic constants, so the
    # oracle recomputes the same buckets in SQL)
    q["ann_lsh_topk"] = ann_lsh

    # k-medoid IVF ANN (reference clustering.rs cells +
    # vector_similarity.rs nprobe): medoid training is ITERATIVE, not
    # SQL-expressible — but the SEARCH path is hash-checkable by
    # probing every cell (n_probe = n_cells): the probed partitions
    # then provably contain the exhaustive top-k, so the result is
    # bit-identical to brute-force cosine and the exhaustive SQL
    # oracle applies (round-4 verdict item 2). The n_probe < n_cells
    # pruning regime (recall/partition-pruning/determinism gates)
    # stays pytest-gated in tests/test_ivf.py.
    def ann_ivf(s: SparkSession, d: str) -> DataFrame:
        import os

        from seekstorm_spark.functions.simsearch import IvfIndex

        name = os.path.basename(d.rstrip("/")) or "sf"
        path = f"/tmp/seekstorm_ivf_idx_{name}"
        if os.path.exists(os.path.join(path, "meta.json")):
            idx = IvfIndex.open(path)
        else:
            idx = IvfIndex.build(
                s, _emb(s, d).filter(F.col("vec_id") != 0), path, n_cells=8
            )
        return idx.search(
            s, ann_query_vec(s, d), k=10, n_probe=int(idx.meta["n_cells"])
        )

    q["ann_ivf_topk"] = ann_ivf

    # multi-vector docs (reference vector.rs chunking + doc-level
    # aggregation, index.rs:2087): the embeddings table plays the part
    # of exploded chunk vectors (doc = vec_id // 4, 4 chunks/doc); a
    # doc scores as the MAX cosine over its chunks. Sentence-boundary
    # chunking + embed plumbing are pytest-gated (test_chunking.py).
    def ann_chunked_topk(s: SparkSession, d: str) -> DataFrame:
        from seekstorm_spark.functions.chunking import chunked_topk

        chunks = (
            _emb(s, d)
            .filter(F.col("vec_id") != 0)
            .select(
                F.expr("vec_id DIV 4").alias("docid"), "embedding"
            )
        )
        return chunked_topk(chunks, ann_query_vec(s, d), k=10)

    q["ann_chunked_topk"] = ann_chunked_topk

    # Model2Vec-style embedding INFERENCE (reference index.rs:2066-2203
    # StaticModel + vector.rs:502-508 encode): static token vectors,
    # mean pooling over piece occurrences, L2-normalize. The model is
    # a deterministic fixture (build_static_model — md5-seeded
    # components the oracle regenerates in SQL), the inference runs
    # through the real Arrow-batched UDF, and the whole pipeline
    # (tokenize → gather → mean → normalize → cosine top-k) is
    # mirrored verbatim in DuckDB.
    def ann_model2vec(s: SparkSession, d: str) -> DataFrame:
        from seekstorm_spark.functions.embedder import (
            StaticEmbedder,
            embed_texts,
        )
        from seekstorm_spark.functions.simsearch import cosine_col

        path = _m2v_model()
        emb = embed_texts(
            _docs(s, d).filter(F.col("doc_id") < 300), path,
            text_col="text",
        )
        qv = [float(x) for x in StaticEmbedder(path).encode(
            [" ".join(M2V_QUERY_TOKS)]
        )[0]]
        return (
            emb.select(
                "doc_id", cosine_col(F.col("embedding"), qv).alias("c")
            )
            .filter(F.col("c").isNotNull())
            .select("doc_id", F.round(F.col("c"), 4).alias("sim"))
            .orderBy(F.col("sim").desc(), F.col("doc_id").asc())
            .limit(10)
        )

    q["ann_model2vec_topk"] = ann_model2vec

    # --- geo radius (reference geo_search.rs:128-144: Morton-range
    # prefilter + exact haversine post-filter). Coordinates derived
    # deterministically from doc_id on both sides. ---
    def geo_radius(s: SparkSession, d: str) -> DataFrame:
        from seekstorm_spark.functions.geo import geo_radius_filter

        docs = (
            _docs(s, d)
            .withColumn(
                "lat", (F.col("doc_id") * 37 % 18000) / 100.0 - 90.0
            )
            .withColumn(
                "lon", (F.col("doc_id") * 73 % 36000) / 100.0 - 180.0
            )
        )
        return (
            geo_radius_filter(
                docs, "lat", "lon", 48.8566, 2.3522, 3000.0
            )
            .select("doc_id", F.round(F.col("dist_km"), 4).alias("dist_km"))
            .orderBy("doc_id")
        )

    q["geo_radius"] = geo_radius

    # --- text analysis ---
    q["text_quality"] = lambda s, d: (
        quality_features(_docs(s, d).filter(F.col("doc_id") < 50)).select(
            "doc_id",
            F.col("n_tokens").cast("long").alias("n_tokens"),
            "punct_ratio",
            "stopword_ratio",
            "mean_token_len",
        )
    )
    q["lang_id"] = lambda s, d: (
        _docs(s, d)
        .filter(F.col("doc_id") < 50)
        .select("doc_id", lang_id_udf(F.col("text")).alias("pred_lang"))
    )

    # Gopher-style repetition quality signals (Rae et al. 2021) —
    # all JVM higher-order functions, per-doc bounded compute
    def quality_repetition(s: SparkSession, d: str) -> DataFrame:
        from seekstorm_spark.functions.textstats import repetition_features

        return (
            repetition_features(_docs(s, d).filter(F.col("doc_id") < 50))
            .select(
                "doc_id",
                "distinct_word_frac",
                "top_word_frac",
                "top_bigram_frac",
                "dup_line_frac",
            )
            .orderBy("doc_id")
        )

    q["quality_repetition"] = quality_repetition

    # BPE-ish regex token counting (GPT-2-style pre-tokenizer pieces,
    # RE2-compatible subset) — one JVM regexp_extract_all per doc
    def token_count_bpe(s: SparkSession, d: str) -> DataFrame:
        from seekstorm_spark.functions.textstats import bpe_token_count

        return (
            _docs(s, d)
            .filter(F.col("doc_id") < 50)
            .select(
                "doc_id", bpe_token_count(F.col("text")).alias("n_bpe")
            )
            .orderBy("doc_id")
        )

    q["token_count_bpe"] = token_count_bpe

    # PII scrubbing over deterministically synthesized PII-bearing
    # text (the corpus itself carries none) — chained JVM
    # regexp_replace, patterns restricted to the Java-regex ∩ RE2
    # common syntax so the DuckDB oracle mirrors them verbatim
    def pii_redact(s: SparkSession, d: str) -> DataFrame:
        from seekstorm_spark.functions.pii import pii_features

        synth = (
            _docs(s, d)
            .filter(F.col("doc_id") < 40)
            .select(
                "doc_id",
                F.concat(
                    F.substring(F.col("text"), 1, 30),
                    F.lit(" user"),
                    F.col("doc_id").cast("string"),
                    F.lit("@example.com (555) 123-"),
                    F.lpad(
                        (F.col("doc_id") % 10000).cast("string"), 4, "0"
                    ),
                    F.lit(" 10."),
                    (F.col("doc_id") % 256).cast("string"),
                    F.lit(".0."),
                    ((F.col("doc_id") * 7) % 256).cast("string"),
                    F.lit(" end"),
                ).alias("text"),
            )
        )
        return (
            pii_features(synth)
            .select("doc_id", "redacted", "n_email", "n_ipv4", "n_phone")
            .orderBy("doc_id")
        )

    q["pii_redact"] = pii_redact

    # corpus-level Unicode normalization (functions/textnorm.py —
    # NFC + newline unification + control/zero-width strip +
    # whitespace collapse; the step a 100-TB ingest runs once before
    # dedup/quality). The dirty prefix is constructed deterministically
    # on BOTH sides so the row proves composition + stripping, not
    # identity on clean ASCII.
    def text_normalize(s: SparkSession, d: str) -> DataFrame:
        from seekstorm_spark.functions.textnorm import normalize_text

        dirty = F.concat(
            F.lit("Cafe\u0301\u200b  du\trag\x07on\r\n\r\n\r\n"),
            F.col("text"),
            F.lit(" \t"),
        )
        return (
            _docs(s, d)
            .filter(F.col("doc_id") < 50)
            .select(
                "doc_id", normalize_text(dirty).alias("norm_text")
            )
            .orderBy("doc_id")
        )

    q["text_normalize"] = text_normalize
    # nested-JSON string-leaf flattening (reference
    # object_values_to_string_vec_recursive, index.rs:5312-5327) over a
    # deterministically constructed nested document
    def json_flatten(s: SparkSession, d: str) -> DataFrame:
        from seekstorm_spark.functions.textstats import json_flatten_values

        docs = _docs(s, d).filter(F.col("doc_id") < 30)
        j = F.to_json(
            F.struct(
                F.col("source"),
                F.struct(F.col("lang"), F.col("n_chars")).alias("meta"),
                F.array(F.lit("tag1"), F.col("lang")).alias("tags"),
            )
        )
        return docs.select("doc_id", json_flatten_values(j).alias("flat"))

    q["json_flatten"] = json_flatten

    q["token_count_ws"] = lambda s, d: (
        _docs(s, d)
        .filter(F.col("doc_id") < 50)
        .select("doc_id", ws_token_count(F.col("text")).cast("long").alias("n_ws"))
    )

    # --- multi-field BM25F with boosts + field filter (reference
    # add_result.rs:1171-1426, search.rs:2483-2495) ---
    def bm25f_two_fields(s: SparkSession, d: str) -> DataFrame:
        from seekstorm_spark.query.dataframe_engine import bm25f_topk

        return bm25f_topk(
            s,
            _docs(s, d),
            ["fast", "src3"],
            fields=[("text", 1.0), ("source", 2.0)],
            qtype="union",
        )

    q["bm25f_two_fields"] = bm25f_two_fields

    def bm25f_field_filter(s: SparkSession, d: str) -> DataFrame:
        from seekstorm_spark.query.dataframe_engine import bm25f_topk

        return bm25f_topk(
            s,
            _docs(s, d),
            ["fast", "src3"],
            fields=[("text", 1.0), ("source", 2.0)],
            qtype="union",
            field_filter=["source"],
        )

    q["bm25f_field_filter"] = bm25f_field_filter

    # --- highlighting (reference highlighter.rs:71-382) ---
    def highlight_kwic(s: SparkSession, d: str) -> DataFrame:
        from seekstorm_spark.functions.highlight import highlight_first

        docs = _docs(s, d)
        top = bm25_topk(s, docs, ["fast", "table"], "intersection", top_k=5)
        return top.join(docs, top.docid == docs.doc_id).select(
            "doc_id",
            highlight_first(F.col("text"), "fast", 30).alias("kwic"),
        )

    q["highlight_kwic"] = highlight_kwic

    # phrase-span KWIC: the whole phrase occurrence is ONE <b> span
    # (reference highlighter.rs:229-322)
    def highlight_kwic_phrase(s: SparkSession, d: str) -> DataFrame:
        from seekstorm_spark.functions.highlight import highlight_phrase

        docs = _docs(s, d)
        top = bm25_phrase_topk(s, docs, ["fast", "table"], top_k=5)
        return top.join(docs, top.docid == docs.doc_id).select(
            "doc_id",
            highlight_phrase(F.col("text"), ["fast", "table"], 30).alias(
                "kwic"
            ),
        )

    q["highlight_kwic_phrase"] = highlight_kwic_phrase

    # --- hybrid RRF fusion (reference search.rs:1962-2035) ---
    def hybrid_rrf(s: SparkSession, d: str) -> DataFrame:
        from seekstorm_spark.functions.fusion import rrf_fuse

        docs = _docs(s, d)
        lex = bm25_topk(s, docs, ["fast", "table"], "union", top_k=10)
        vec = cosine_topk(
            _emb(s, d).filter(F.col("vec_id") != 0), ann_query_vec(s, d), k=10
        ).withColumnRenamed("vec_id", "docid")
        return rrf_fuse(lex, vec, id_col="docid", top_k=10)

    q["hybrid_rrf"] = hybrid_rrf

    # hybrid SearchMode THROUGH the engine: one search() call runs the
    # indexed WAND lexical kernel AND the signature-partitioned ANN
    # probe, fused by RRF k=0.6 (reference search.rs:73-96,1962-2035).
    # Oracle = the f32-exact WAND SQL + the hyperplane-signature SQL,
    # fused by the same rank arithmetic.
    def wand_hybrid_rrf(s: SparkSession, d: str) -> DataFrame:
        import os

        from seekstorm_spark.functions.simsearch import AnnIndex
        from seekstorm_spark.query.engine import search

        store = _wand_store(s, d)
        name = os.path.basename(d.rstrip("/")) or "sf"
        path = f"/tmp/seekstorm_ann_idx_{name}"
        if os.path.exists(os.path.join(path, "meta.json")):
            idx = AnnIndex.open(path)
        else:
            idx = AnnIndex.build(
                s, _emb(s, d).filter(F.col("vec_id") != 0), path, n_planes=8
            )
        return search(
            s, store, "fast table", top_k=10, default_type="union",
            mode="hybrid", vector=ann_query_vec(s, d), ann_index=idx,
        )

    q["wand_hybrid_rrf"] = wand_hybrid_rrf

    # batched hybrid serving: N (query, vector) pairs in ONE action —
    # the lexical side rides the fused search_many kernel, each
    # query's partition-pruned ANN probe unions into the same plan,
    # RRF fuses per query (bit-identical to search(mode="hybrid")).
    def wand_multi_hybrid(s: SparkSession, d: str) -> DataFrame:
        import os

        from seekstorm_spark.functions.simsearch import AnnIndex
        from seekstorm_spark.query.engine import search_many_hybrid

        store = _wand_store(s, d)
        name = os.path.basename(d.rstrip("/")) or "sf"
        path = f"/tmp/seekstorm_ann_idx_{name}"
        if os.path.exists(os.path.join(path, "meta.json")):
            idx = AnnIndex.open(path)
        else:
            idx = AnnIndex.build(
                s, _emb(s, d).filter(F.col("vec_id") != 0), path, n_planes=8
            )
        qvs = [
            [float(x) for x in r["embedding"]]
            for r in _emb(s, d)
            .filter(F.col("vec_id") < len(_MH_QUERIES))
            .orderBy("vec_id")
            .collect()
        ]
        return search_many_hybrid(
            s, store, list(_MH_QUERIES), qvs, top_k=10, ann_index=idx
        )

    q["wand_multi_hybrid"] = wand_multi_hybrid

    # frequent-term result cache (reference search.rs:3388-3445
    # cached top-1000, index.rs:1644): the single-term query serves
    # from a precomputed list DRIVER-side — the returned plan is a
    # local scan, zero Spark jobs — and must stay bit-identical to
    # the WAND kernel (the oracle is the same f32-exact SQL).
    def wand_cached_frequent(s: SparkSession, d: str) -> DataFrame:
        from seekstorm_spark.query.engine import search
        from seekstorm_spark.query.result_cache import (
            build_result_cache,
            cached_single_term,
        )

        store = _wand_store(s, d)
        if cached_single_term(store, "fast", 10) is None:
            build_result_cache(s, store, terms=["fast"], k=100)
        out = search(s, store, "fast", top_k=10, default_type="union")
        plan = out._jdf.queryExecution().executedPlan().toString()
        assert "ExistingRDD" in plan or "LocalTableScan" in plan, plan
        return out.select(
            "docid", F.round(F.col("score").cast("double"), 4).alias("score")
        )

    q["wand_cached_frequent"] = wand_cached_frequent

    # numeric sort-key block skipping (v5 zone bounds): top-k by a
    # numeric facet keeps a key threshold in the kernel and skips
    # blocks whose zone min can't beat it (tests/test_sortkey_pruning
    # gates skip behavior + bit-identity with prune=False)
    def wand_numeric_sort_pruned(s: SparkSession, d: str) -> DataFrame:
        from seekstorm_spark.query.engine import search

        out = search(
            s, _wand_store(s, d), "fast", top_k=10, default_type="union",
            result_sort=[("n_chars", "asc")],
        )
        return out.select(
            "docid",
            F.col("n_chars").cast("double").alias("n_chars"),
            F.round(F.col("score").cast("double"), 4).alias("score"),
        )

    q["wand_numeric_sort_pruned"] = wand_numeric_sort_pruned

    # --- generic analytics over the star schema (engine breadth) ---
    q["agg_pricing_summary"] = lambda s, d: (
        s.read.parquet(f"{d}/lineitem.parquet")
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 2).alias("sum_price"),
            F.round(F.avg("l_discount"), 6).alias("avg_disc"),
            F.count("*").cast("long").alias("n"),
        )
    )

    def top_customers(s: SparkSession, d: str) -> DataFrame:
        orders = s.read.parquet(f"{d}/orders.parquet")
        cust = s.read.parquet(f"{d}/customer.parquet")
        return (
            orders.groupBy("o_custkey")
            .agg(F.round(F.sum("o_totalprice"), 2).alias("revenue"))
            .join(F.broadcast(cust), F.col("o_custkey") == F.col("c_custkey"))
            .select("c_custkey", "c_name", "revenue")
            .orderBy(F.col("revenue").desc(), F.col("c_custkey").asc())
            .limit(10)
        )

    q["agg_top_customers"] = top_customers
    q["agg_events_daily"] = lambda s, d: (
        s.read.parquet(f"{d}/events.parquet")
        .groupBy("event_type", F.to_date("ts").alias("day"))
        .agg(
            F.count("*").cast("long").alias("n"),
            F.round(F.avg("value"), 6).alias("avg_value"),
        )
    )

    # The correctness driver samples the FIRST 50 keys in registration
    # order. Round-5 rotation (round-4 verdict item 10): the 50 rows
    # the round-4 artifact sampled go to the BACK; everything else —
    # the rows whose freshest driver evidence is r01-r03, plus this
    # round's new rows — fills the front slots, so r05's sample
    # re-covers the oldest evidence with minimal overlap.
    sampled_r04 = {
        "wand_index_facet_stats", "wand_count_filtered", "doc_store_get",
        "ingest_fvecs", "ingest_html_extract", "dedup_embedding_pairs",
        "decontaminate_overlap", "highlight_kwic_phrase", "ann_dot_topk",
        "ann_euclidean_topk", "ann_quantized_cosine", "ann_ivf_topk",
        "wand_hybrid_rrf", "wand_multi_geo_sort", "ann_chunked_topk",
        "wand_cached_frequent", "wand_numeric_sort_pruned",
        "ann_affine_cosine", "ann_turboquant_topk", "wand_phrase_proximity",
        "wand_multi_hybrid", "ingest_warc", "pii_redact",
        "quality_repetition", "token_count_bpe", "ingest_pdf",
        "dedup_components", "url_canonicalize", "quality_c4", "dedup_spans",
        "sample_stratified", "pack_sequences", "quality_bigram_nll",
        "ann_model2vec_topk", "text_normalize", "ingest_pdf_meta",
        "dedup_incremental_minhash", "crawl_robots_filter", "ingest_sitemap",
        "wand_geo_range_facet", "wand_multi_geo_range", "wand_facet_prefix",
        "wand_facet_topn", "tokenize_count", "term_df",
        "doc_length_quantized", "corpus_stats", "bm25_topk_and",
        "bm25_topk_or", "bm25_topk_or3",
    }
    # exception: ann_ivf_topk was r04's one no_oracle row and is now
    # hash-checkable — pin it FIRST so r05 certainly records the hash
    ordered = {"ann_ivf_topk": q["ann_ivf_topk"]}
    ordered.update(
        (k, v) for k, v in q.items() if k not in sampled_r04
    )
    ordered.update((k, v) for k, v in q.items() if k not in ordered)
    return ordered


def oracle_sql() -> dict[str, str]:
    o: dict[str, str] = {}
    o["tokenize_count"] = (
        "SELECT doc_id, len(list_filter(string_split(text, ' '), "
        "x -> x <> ''))::BIGINT AS n_tokens FROM documents WHERE doc_id < 50"
    )
    o["tokenize_marks"] = (
        "SELECT sid::BIGINT AS sid, pos::BIGINT AS pos, token "
        "FROM (VALUES (0, 0, 'मेरी'), (0, 1, 'किताबों'), (0, 2, 'अच'), (0, 3, 'छी'), (0, 4, 'हैं'), (1, 0, 'வீடுகளில'), (1, 1, 'இருந'), (1, 2, 'து'), (2, 0, 'דאס'), (2, 1, 'בוך'), (2, 2, 'איז'), (2, 3, 'גוט'), (3, 0, 'عَرَبِيّ'), (3, 1, 'كِتَاب'), (4, 0, 'c++'), (4, 1, 'and'), (4, 2, 'c#'), (4, 3, 'in'), (4, 4, 'x-ray')) AS t(sid, pos, token)"
    )
    o["term_df"] = (
        f"SELECT term, count(DISTINCT doc_id)::BIGINT AS df, "
        f"count(*)::BIGINT AS cf FROM {_TOKS} GROUP BY term"
    )
    o["doc_length_quantized"] = (
        f"WITH {_DLQ_CTES} "
        "SELECT doc_id AS docid, dl_raw::BIGINT AS dl_raw, dl_q::BIGINT AS dl_q "
        "FROM dlq"
    )
    o["corpus_stats"] = (
        f"WITH {_DLQ_CTES} "
        "SELECT count(*)::BIGINT AS n_docs, "
        "round(sum(dl_q)::DOUBLE / count(*), 6) AS avgdl, "
        "sum(dl_raw)::BIGINT AS total_tokens FROM dlq"
    )
    o["bm25_topk_and"] = _bm25_sql(["fast", "table"], "intersection")
    o["bm25_topk_or"] = _bm25_sql(["fast", "table"], "union")
    o["bm25_topk_or3"] = _bm25_sql(["key", "value", "stream"], "union")
    o["bm25_not"] = _bm25_sql(["fast"], "union", not_terms=["dup"])
    o["bm25_single_rare"] = _bm25_sql(["dup"], "union")
    o["bm25_phrase"] = _bm25_sql(
        ["fast", "table"], "intersection", phrase=["fast", "table"]
    )
    o["wand_topk_and"] = _wand_bm25_sql(["fast", "table"], "intersection")
    o["wand_topk_or"] = _wand_bm25_sql(["fast", "table"], "union")
    o["wand_topk_or3"] = _wand_bm25_sql(["key", "value", "stream"], "union")
    o["wand_phrase"] = _wand_bm25_sql(
        ["fast", "table"], "phrase", phrase=["fast", "table"]
    )
    o["wand_not"] = _wand_bm25_sql(["fast"], "union", not_terms=["dup"])
    # the AND misses (<10 docs carry both terms in the 40-doc slice),
    # so the fallback page IS the union top-10 over that slice
    o["wand_fallback"] = _wand_bm25_sql(
        ["dup", "query"], "union",
        docs_src="(SELECT * FROM documents WHERE doc_id < 40)",
    )
    o["wand_single"] = _wand_bm25_sql(["dup"], "union")
    o["wand_phrase_ngram"] = _wand_bm25_sql(
        ["fast", "table"], "phrase", phrase=["fast", "table"]
    )
    # Bm25fProximity: gram df/tf replace the partial terms'
    o["wand_phrase_proximity"] = _wand_proximity_sql("fast", "table")
    # trigram path must be bit-identical to the positional phrase
    o["wand_phrase_ngram3"] = _wand_bm25_sql(
        ["fast", "table", "scan"], "phrase", phrase=["fast", "table", "scan"]
    )
    # realtime level-0: staged+committed must equal the FULL corpus
    o["wand_realtime"] = _wand_bm25_sql(["fast", "table"], "intersection")
    # spell rewrite: the misspelled query returns the corrected top-k
    o["wand_spell_rewrite"] = _wand_bm25_sql(["fast", "table"], "intersection")
    # suggest rewrite: trailing "st" completes to the df-top term with
    # that prefix — recompute the completion in SQL for independence
    o["wand_suggest_rewrite"] = _wand_bm25_sql(["fast", "stream"], "union")
    o["wand_facet_count"] = f"""
SELECT 'lang' AS facet, lang AS value, count(*)::BIGINT AS n
FROM documents
WHERE doc_id IN (SELECT DISTINCT doc_id FROM {_TOKS} WHERE term = 'fast')
GROUP BY lang
"""
    o["wand_facet_range"] = f"""
WITH base AS (
  SELECT CASE WHEN n_chars >= 300 THEN 300.0
              WHEN n_chars >= 200 THEN 200.0
              WHEN n_chars >= 100 THEN 100.0
              ELSE 0.0 END AS bucket_lo,
         count(*)::BIGINT AS n
  FROM documents
  WHERE doc_id IN (SELECT DISTINCT doc_id FROM {_TOKS} WHERE term = 'fast')
  GROUP BY 1)
SELECT 'n_chars' AS facet, bucket_lo, n,
       sum(n) OVER (ORDER BY bucket_lo
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)::BIGINT
         AS n_cumulative
FROM base
"""
    # delete-by-query: docs containing 'dup' are deleted, then scored
    # search over the survivors. Stats (df/avgdl/N) stay the PRE-delete
    # corpus values — lazy deletion filters results, not statistics
    # (compaction is what recomputes stats).
    o["wand_delete_by_query"] = _wand_bm25_sql(
        ["fast", "table"],
        "union",
        extra_where=(
            "docid NOT IN (SELECT DISTINCT doc_id FROM toks "
            "WHERE term = 'dup')"
        ),
    )
    o["wand_facet_set_filter"] = _wand_bm25_sql(
        ["fast", "table"],
        "union",
        extra_where=(
            "docid IN (SELECT doc_id FROM documents "
            "WHERE doc_id % 5 = 1 OR (doc_id * 7) % 5 = 1)"
        ),
    )
    o["wand_facet_set_count"] = f"""
SELECT 'tags' AS facet, tag AS value, count(*)::BIGINT AS n
FROM (
  SELECT doc_id, unnest(list_distinct(
           ['t' || (doc_id % 5)::VARCHAR,
            't' || ((doc_id * 7) % 5)::VARCHAR])) AS tag
  FROM documents
  WHERE doc_id IN (SELECT DISTINCT doc_id FROM {_TOKS} WHERE term = 'fast'))
GROUP BY tag
"""
    o["wand_numeric_facet_filter"] = _wand_bm25_sql(
        ["fast", "table"],
        "union",
        extra_where=(
            "docid IN (SELECT doc_id FROM documents "
            "WHERE n_chars BETWEEN 100 AND 300)"
        ),
    )
    geo_where = """docid IN (
  SELECT doc_id FROM (
    SELECT doc_id,
           2.0 * 6371.0 * asin(sqrt(
             pow(sin(radians(48.8566 - ((doc_id * 37 % 18000) / 100.0 - 90.0)) / 2), 2)
             + cos(radians((doc_id * 37 % 18000) / 100.0 - 90.0))
               * cos(radians(48.8566))
               * pow(sin(radians(2.3522 - ((doc_id * 73 % 36000) / 100.0 - 180.0)) / 2), 2)
           )) AS dist_km
    FROM documents)
  WHERE dist_km <= 6000.0)"""
    o["wand_geo_radius"] = _wand_bm25_sql(
        ["fast"], "union", extra_where=geo_where,
    )
    # geo distance-bucket facet: the kernel's haversine mirrored in
    # DuckDB trig over the match set, bucketed by the same lower
    # bounds, with CountWithinRange cumulative sums
    o["wand_geo_range_facet"] = f"""
WITH m AS (
  SELECT doc_id,
         2.0 * 6371.0 * asin(sqrt(
           pow(sin(radians(48.8566 - ((doc_id * 37 % 18000) / 100.0 - 90.0)) / 2), 2)
           + cos(radians((doc_id * 37 % 18000) / 100.0 - 90.0))
             * cos(radians(48.8566))
             * pow(sin(radians(2.3522 - ((doc_id * 73 % 36000) / 100.0 - 180.0)) / 2), 2)
         )) AS dist_km
  FROM documents
  WHERE doc_id IN (SELECT DISTINCT doc_id FROM {_TOKS}
                   WHERE term = 'fast')),
b AS (SELECT CASE WHEN dist_km >= 15000 THEN 15000.0
                  WHEN dist_km >= 8000 THEN 8000.0
                  WHEN dist_km >= 3000 THEN 3000.0
                  ELSE 0.0 END AS bucket_lo,
             count(*)::BIGINT AS n
      FROM m GROUP BY 1)
SELECT bucket_lo, n,
       (sum(n) OVER (ORDER BY bucket_lo))::BIGINT AS n_cum
FROM b ORDER BY bucket_lo
"""
    def _geo_bucket_block(qid, term_pred, lat0, lon0, bounds):
        cases = " ".join(
            f"WHEN dist_km >= {b} THEN {float(b)}"
            for b in sorted(bounds, reverse=True)[:-1]
        )
        return f"""
SELECT {qid} AS query_id, bucket_lo, count(*)::BIGINT AS n
FROM (
  SELECT CASE {cases} ELSE {float(min(bounds))} END AS bucket_lo
  FROM (
    SELECT doc_id,
           2.0 * 6371.0 * asin(sqrt(
             pow(sin(radians({lat0} - ((doc_id * 37 % 18000) / 100.0 - 90.0)) / 2), 2)
             + cos(radians((doc_id * 37 % 18000) / 100.0 - 90.0))
               * cos(radians({lat0}))
               * pow(sin(radians({lon0} - ((doc_id * 73 % 36000) / 100.0 - 180.0)) / 2), 2)
           )) AS dist_km
    FROM documents
    WHERE doc_id IN (SELECT DISTINCT doc_id FROM {_TOKS}
                     WHERE term IN ({term_pred}))))
GROUP BY bucket_lo
"""

    o["wand_multi_geo_range"] = (
        "SELECT * FROM (\n"
        + "\nUNION ALL\n".join(
            [
                _geo_bucket_block(
                    0, "'fast'", 48.8566, 2.3522,
                    [0.0, 3000.0, 8000.0, 15000.0],
                ),
                _geo_bucket_block(
                    1, "'fast', 'table'", -20.0, 130.0, [0.0, 6000.0]
                ),
            ]
        )
        + "\n) ORDER BY query_id, bucket_lo"
    )

    o["wand_facet_prefix"] = f"""
SELECT lang AS value, count(*)::BIGINT AS n
FROM documents
WHERE doc_id IN (SELECT DISTINCT doc_id FROM {_TOKS} WHERE term = 'fast')
  AND lang LIKE 'e%'
GROUP BY lang ORDER BY value
"""
    o["wand_facet_topn"] = f"""
SELECT lang AS value, n FROM (
  SELECT lang, count(*)::BIGINT AS n,
         row_number() OVER (ORDER BY count(*) DESC, lang ASC) AS rk
  FROM documents
  WHERE doc_id IN (SELECT DISTINCT doc_id FROM {_TOKS}
                   WHERE term = 'fast')
  GROUP BY lang)
WHERE rk <= 3 ORDER BY n DESC, value ASC
"""
    o["wand_multi_geo"] = "\nUNION ALL\n".join(
        f"SELECT {i} AS query_id, * FROM (" + sql + ")"
        for i, sql in enumerate(
            [
                _wand_bm25_sql(["fast"], "union", extra_where=geo_where),
                _wand_bm25_sql(["fast", "table"], "union"),
            ]
        )
    )
    # batched distance sort: per-query direction and radius, same
    # haversine as the kernel; match sets from the token oracle
    def _geo_sort_block(qid: int, term_pred: str, radius: float,
                        direction: str) -> str:
        return f"""
SELECT {qid} AS query_id, doc_id AS docid,
       round(dist_km, 4) AS geo_dist
FROM (
  SELECT doc_id,
         2.0 * 6371.0 * asin(sqrt(
           pow(sin(radians(48.8566 - lat) / 2), 2)
           + cos(radians(lat)) * cos(radians(48.8566))
             * pow(sin(radians(2.3522 - lon) / 2), 2))) AS dist_km
  FROM (SELECT doc_id,
               (doc_id * 37 % 18000) / 100.0 - 90.0 AS lat,
               (doc_id * 73 % 36000) / 100.0 - 180.0 AS lon
        FROM documents))
WHERE dist_km <= {radius}
  AND doc_id IN (SELECT DISTINCT doc_id FROM {_TOKS}
                 WHERE term IN ({term_pred}))
ORDER BY dist_km {direction.upper()}, doc_id ASC LIMIT 10
"""

    o["wand_multi_geo_sort"] = "\nUNION ALL\n".join(
        f"SELECT * FROM ({b})"
        for b in [
            _geo_sort_block(0, "'fast'", 6000.0, "asc"),
            _geo_sort_block(1, "'fast', 'table'", 9000.0, "desc"),
        ]
    )

    # distance result-sort: same haversine (all float64, identical
    # operation order to the kernel), nearest first, docid tiebreak
    o["wand_geo_sort"] = f"""
WITH toks AS (SELECT * FROM {_TOKS}),
geo AS (
  SELECT doc_id,
         2.0 * 6371.0 * asin(sqrt(
           pow(sin(radians(48.8566 - lat) / 2), 2)
           + cos(radians(lat)) * cos(radians(48.8566))
             * pow(sin(radians(2.3522 - lon) / 2), 2))) AS dist_km
  FROM (SELECT doc_id,
               (doc_id * 37 % 18000) / 100.0 - 90.0 AS lat,
               (doc_id * 73 % 36000) / 100.0 - 180.0 AS lon
        FROM documents))
SELECT doc_id AS docid, round(dist_km, 4) AS geo_dist
FROM geo
WHERE dist_km <= 6000.0
  AND doc_id IN (SELECT DISTINCT doc_id FROM toks WHERE term = 'fast')
ORDER BY dist_km ASC, doc_id ASC LIMIT 10
"""
    o["ingest_csv"] = """
SELECT lang, count(*)::BIGINT AS n, sum(n_chars)::BIGINT AS total_chars,
       sum(length(text))::BIGINT AS total_text_len
FROM documents GROUP BY lang
"""
    # batched multi-query: each query's oracle is its single-query
    # wand SQL, tagged with its position
    o["wand_multi_query"] = "\nUNION ALL\n".join(
        f"SELECT {i} AS query_id, * FROM ("
        + _wand_bm25_sql(terms, qtype, not_terms=nots, phrase=phr)
        + ")"
        for i, (terms, qtype, nots, phr) in enumerate(_MQ_SPECS)
    )
    # Point facet: same distances/order as the lat/lon pair form
    o["wand_geo_point"] = o["wand_geo_sort"]
    # miles: identical candidate set and order, distance / 1.609344
    # (the same float64 constant and operation on both sides)
    o["wand_geo_miles"] = o["wand_geo_sort"].replace(
        "round(dist_km, 4) AS geo_dist",
        "round(dist_km / 1.609344, 4) AS geo_dist_mi",
    )
    # packed Morton Point: distances from the QUANTIZED coordinates —
    # trunc(x·10^7)/10^7 here mirrors the kernel's i32 encode/decode
    # (numpy astype(int64) truncates toward zero, as trunc() does)
    o["wand_geo_morton"] = f"""
WITH toks AS (SELECT * FROM {_TOKS}),
geo AS (
  SELECT doc_id,
         2.0 * 6371.0 * asin(sqrt(
           pow(sin(radians(48.8566 - lat) / 2), 2)
           + cos(radians(lat)) * cos(radians(48.8566))
             * pow(sin(radians(2.3522 - lon) / 2), 2))) AS dist_km
  FROM (SELECT doc_id,
               trunc(((doc_id * 37 % 18000) / 100.0 - 90.0)
                     * 10000000.0) / 10000000.0 AS lat,
               trunc(((doc_id * 73 % 36000) / 100.0 - 180.0)
                     * 10000000.0) / 10000000.0 AS lon
        FROM documents))
SELECT doc_id AS docid, round(dist_km, 4) AS geo_dist
FROM geo
WHERE dist_km <= 6000.0
  AND doc_id IN (SELECT DISTINCT doc_id FROM toks WHERE term = 'fast')
ORDER BY dist_km ASC, doc_id ASC LIMIT 10
"""
    # compacted index ≡ fresh build over the survivors (stats included)
    o["wand_compacted"] = _wand_bm25_sql(
        ["fast", "table"],
        "union",
        docs_src=(
            "(SELECT doc_id, text FROM documents WHERE doc_id NOT IN "
            "(SELECT DISTINCT doc_id FROM "
            "(SELECT doc_id, unnest(string_split(text, ' ')) AS term "
            "FROM documents) WHERE term = 'dup'))"
        ),
    )
    # update-document: stats over documents + the re-added version
    # (the old doc is lazily deleted — still counted), results minus
    # the old docid
    o["wand_update_doc"] = _wand_bm25_sql(
        ["fast", "table"],
        "union",
        docs_src=(
            "(SELECT doc_id, text FROM documents UNION ALL "
            f"SELECT {_UPD_NEW} AS doc_id, '{_UPD_TEXT}' AS text)"
        ),
        extra_where=f"docid <> {_UPD_OLD}",
    )
    o["spell_correct"] = f"""
WITH toks AS (SELECT * FROM {_TOKS}),
dict AS (SELECT term, count(DISTINCT doc_id) AS df FROM toks GROUP BY 1),
words(word) AS (VALUES ('fastt'), ('tabel'), ('strem')),
cand AS (SELECT w.word, d.term,
                damerau_levenshtein(w.word, d.term) AS dist, d.df
         FROM words w CROSS JOIN dict d
         WHERE damerau_levenshtein(w.word, d.term) <= 2),
rnk AS (SELECT *, row_number() OVER (
          PARTITION BY word ORDER BY dist ASC, df DESC, term ASC) AS rn
        FROM cand)
SELECT w.word, r.term AS correction
FROM words w LEFT JOIN rnk r ON r.word = w.word AND r.rn = 1
ORDER BY w.word
"""
    # QAC dictionary = unigrams + tokenizer_lite bigrams ("a b"
    # strings, df = docs containing the adjacency)
    _qac_dict = f"""
WITH toks AS (SELECT * FROM {_TOKS}),
big AS (SELECT DISTINCT t0.doc_id, t0.term || ' ' || t1.term AS term
        FROM toks t0 JOIN toks t1
          ON t1.doc_id = t0.doc_id AND t1.pos = t0.pos + 1),
uni AS (SELECT term, count(DISTINCT doc_id) AS df FROM toks GROUP BY 1),
bdf AS (SELECT term, count(*) AS df FROM big GROUP BY 1),
dict AS (SELECT * FROM uni UNION ALL SELECT * FROM bdf)
"""
    o["qac_suggest"] = (
        _qac_dict
        + """SELECT row_number() OVER (ORDER BY df DESC, term ASC) AS rank, term
FROM dict WHERE term LIKE 'st%'
ORDER BY df DESC, term ASC LIMIT 5
"""
    )
    o["qac_suggest_bigram"] = (
        _qac_dict
        + """SELECT row_number() OVER (ORDER BY df DESC, term ASC) AS rank, term
FROM dict WHERE term LIKE 'fast t%'
ORDER BY df DESC, term ASC LIMIT 5
"""
    )

    # synonym expansion: the effective token stream is the original
    # plus a swapped copy of every fast/stream occurrence
    _toks_syn = (
        f"(SELECT doc_id, term, pos FROM {_TOKS} t1 "
        "UNION ALL "
        "SELECT doc_id, CASE term WHEN 'fast' THEN 'stream' "
        "ELSE 'fast' END AS term, pos "
        f"FROM {_TOKS} t2 WHERE term IN ('fast','stream'))"
    )
    o["wand_synonym"] = _wand_bm25_sql(["fast"], "union", toks_src=_toks_syn)
    o["wand_facet_filter"] = _wand_bm25_sql(
        ["fast", "table"],
        "union",
        extra_where=(
            "docid IN (SELECT doc_id FROM documents WHERE lang = 'en')"
        ),
    )
    o["wand_facet_sort"] = _wand_bm25_sql(
        ["fast"],
        "union",
        final_select="""SELECT docid, lang, round(raw::DOUBLE, 4) AS score FROM (
  SELECT s.docid, s.raw, d.lang FROM scored s
  JOIN documents d ON d.doc_id = s.docid
  ORDER BY d.lang ASC, s.raw DESC, s.docid ASC LIMIT 20)""",
    )
    o["wand_bm25f_two_fields"] = _wand_bm25f_sql(["fast", "src3"], [1.0, 2.0])
    o["wand_bm25f_field_filter"] = _wand_bm25f_sql(
        ["fast", "src3"], [1.0, 2.0], field_filter=1
    )
    o["wand_count_and"] = _match_count_sql(["fast", "table"], "intersection")
    o["wand_multi_count"] = "\nUNION ALL\n".join(
        f"SELECT {i} AS query_id, * FROM ("
        + _match_count_sql(terms, qtype, not_terms=nots, phrase=phr)
        + ")"
        for i, (terms, qtype, nots, phr) in enumerate(_MQ_SPECS)
    )
    o["wand_multi_facet_count"] = f"""
SELECT 0 AS query_id, 'lang' AS facet, lang AS value, count(*)::BIGINT AS n
FROM documents
WHERE doc_id IN (SELECT DISTINCT doc_id FROM {_TOKS} WHERE term = 'fast')
GROUP BY lang
UNION ALL
SELECT 1, 'lang', lang, count(*)::BIGINT
FROM documents
WHERE doc_id IN (SELECT DISTINCT doc_id FROM {_TOKS} WHERE term = 'fast')
  AND doc_id IN (SELECT DISTINCT doc_id FROM {_TOKS} WHERE term = 'table')
GROUP BY lang
UNION ALL
SELECT 2, 'lang', lang, count(*)::BIGINT
FROM documents
WHERE doc_id IN (SELECT DISTINCT doc_id FROM {_TOKS} WHERE term = 'fast')
  AND doc_id NOT IN (SELECT DISTINCT doc_id FROM {_TOKS} WHERE term = 'dup')
GROUP BY lang
"""
    o["wand_multi_facet_filter"] = "\nUNION ALL\n".join(
        f"SELECT {i} AS query_id, * FROM (" + sql + ")"
        for i, sql in enumerate(
            [
                _wand_bm25_sql(
                    ["fast", "table"],
                    "union",
                    extra_where=(
                        "docid IN (SELECT doc_id FROM documents "
                        "WHERE lang IN ('en', 'fr'))"
                    ),
                ),
                _wand_bm25_sql(
                    ["fast"],
                    "union",
                    extra_where=(
                        "docid IN (SELECT doc_id FROM documents "
                        "WHERE n_chars BETWEEN 100 AND 300)"
                    ),
                ),
                _wand_bm25_sql(["key", "value"], "union"),
            ]
        )
    )
    # float64 cosine from float32 components, positional zip of the
    # two lists; the sub-1e-15 summation-order difference vs Spark's
    # sequential aggregate cannot move round(…, 4)
    # exact all-pairs twin over the SAME planted-near-dup corpus the
    # Spark row scans via banded LSH (recall 1.0 is pytest-gated
    # against this exact construction at both sf dirs)
    o["dedup_embedding_pairs"] = """
WITH aug AS (
  SELECT vec_id, embedding FROM embeddings
  UNION ALL
  SELECT vec_id + 10000 AS vec_id,
         list_transform(range(0, 64), i ->
           (embedding[i + 1]::DOUBLE +
            ((vec_id * 37 + i * 17) % 13 - 6)::DOUBLE * 0.003::DOUBLE
           )::FLOAT) AS embedding
  FROM embeddings),
pairs AS (
  SELECT a.vec_id AS id_a, b.vec_id AS id_b,
         a.embedding AS ea, b.embedding AS eb
  FROM aug a JOIN aug b ON a.vec_id < b.vec_id),
sums AS (
  SELECT id_a, id_b,
         list_sum(list_transform(range(1, 65),
           i -> ea[i]::DOUBLE * eb[i]::DOUBLE)) AS dot,
         list_sum(list_transform(ea, x -> x::DOUBLE * x::DOUBLE)) AS na2,
         list_sum(list_transform(eb, x -> x::DOUBLE * x::DOUBLE)) AS nb2
  FROM pairs)
SELECT id_a, id_b,
       round(dot / (sqrt(na2) * sqrt(nb2)), 4) AS cosine
FROM sums WHERE dot / (sqrt(na2) * sqrt(nb2)) >= 0.9
"""
    o["decontaminate_overlap"] = """
WITH docs AS (SELECT doc_id, list_filter(string_split(trim(lower(text)), ' '),
                                         x -> x <> '') AS toks
              FROM documents),
sh AS (SELECT DISTINCT doc_id, array_to_string(toks[i:i+3], ' ') AS shingle
       FROM (SELECT doc_id, toks,
                    unnest(range(1, greatest(len(toks) - 3, 0) + 1)) AS i
             FROM docs)),
probes AS (SELECT * FROM sh WHERE doc_id % 13 = 0)
SELECT s.doc_id, p.doc_id AS probe_id, count(*)::BIGINT AS n_common
FROM sh s JOIN probes p ON s.shingle = p.shingle AND s.doc_id <> p.doc_id
GROUP BY 1, 2
"""
    o["ingest_html_extract"] = "SELECT doc_id, text FROM documents"
    # WARC round trip: url/date derive from doc_id, status defaults to
    # 200, and extraction must return the source text byte-identically
    o["ingest_pdf"] = (
        "SELECT doc_id, text FROM documents WHERE doc_id < 120 "
        "ORDER BY doc_id"
    )
    # ingest_pdf_meta: title/date per the reference fallback chain —
    # g=0 carries /Info metadata, g=1 falls back to the first body
    # line (truncate 160 + trim) and the default date, g=2 parses the
    # +02'00 offset; n_chars = Σ len(page) + 2 per page (" \n" joiner)
    o["ingest_pdf_meta"] = """
WITH t AS (SELECT doc_id, text FROM documents WHERE doc_id < 15),
grp AS (SELECT doc_id // 5 AS g,
               (sum(length(text)) + 2 * count(*))::BIGINT AS n_chars,
               min(doc_id) AS lo
        FROM t GROUP BY 1),
ft AS (SELECT g.g, g.n_chars,
              trim(substr(t.text || ' ', 1, 160)) AS fallback_title
       FROM grp g JOIN t ON t.doc_id = g.lo)
SELECT 'f' || g::VARCHAR || '.pdf' AS fname,
       CASE g WHEN 0 THEN 'Meta Title Zero' ELSE fallback_title END
         AS title,
       (CASE g WHEN 0 THEN 1577836800 WHEN 1 THEN 1111
               ELSE 1704157445 END)::BIGINT AS ts,
       n_chars
FROM ft ORDER BY fname
"""
    o["ingest_warc"] = """
SELECT 'http://crawl.test/' || lpad(doc_id::VARCHAR, 6, '0') AS url,
       strftime(TIMESTAMP '2026-01-01 00:00:00'
                + INTERVAL (doc_id) SECOND, '%Y-%m-%dT%H:%M:%SZ')
         AS warc_date,
       200::INTEGER AS http_status,
       text
FROM documents WHERE doc_id < 200
"""
    o["wand_multi_facet_range"] = f"""
WITH m0 AS (SELECT DISTINCT doc_id FROM {_TOKS} WHERE term = 'fast'),
m1 AS (SELECT doc_id FROM (SELECT DISTINCT doc_id FROM {_TOKS}
                           WHERE term = 'fast')
       WHERE doc_id IN (SELECT DISTINCT doc_id FROM {_TOKS}
                        WHERE term = 'table')),
b0 AS (SELECT 0 AS query_id, 'n_chars' AS facet,
              CASE WHEN n_chars >= 300 THEN 300.0
                   WHEN n_chars >= 200 THEN 200.0
                   WHEN n_chars >= 100 THEN 100.0
                   ELSE 0.0 END AS bucket_lo,
              count(*)::BIGINT AS n
       FROM documents WHERE doc_id IN (SELECT doc_id FROM m0)
       GROUP BY 3),
b1 AS (SELECT 1, 'n_chars',
              CASE WHEN n_chars >= 150 THEN 150.0 ELSE 0.0 END,
              count(*)::BIGINT
       FROM documents WHERE doc_id IN (SELECT doc_id FROM m1)
       GROUP BY 3),
u AS (SELECT * FROM b0 UNION ALL SELECT * FROM b1)
SELECT query_id, facet, bucket_lo, n,
       sum(n) OVER (PARTITION BY query_id, facet ORDER BY bucket_lo
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
                   )::BIGINT AS n_cumulative
FROM u
"""
    o["wand_index_facet_stats"] = """
SELECT 'lang' AS facet, lang AS value, count(*)::BIGINT AS n
FROM documents GROUP BY lang
"""
    o["wand_count_filtered"] = f"""
SELECT count(DISTINCT t.doc_id)::BIGINT AS matches
FROM {_TOKS} t JOIN documents d ON d.doc_id = t.doc_id
WHERE t.term = 'fast' AND d.lang IN ('en', 'fr')
  AND d.n_chars BETWEEN 100 AND 300
"""
    o["doc_store_get"] = """
SELECT doc_id AS docid, lang, source, n_chars::BIGINT AS n_chars
FROM documents WHERE doc_id IN (3, 17, 101, 250)
"""
    o["ingest_fvecs"] = """
SELECT vec_id, len(embedding)::INT AS dim,
       embedding[1]::DOUBLE AS c0, embedding[-1]::DOUBLE AS clast
FROM embeddings
"""
    o["count_and"] = _match_count_sql(["fast", "table"], "intersection")
    o["count_or"] = _match_count_sql(["fast", "table"], "union")
    o["count_phrase"] = _match_count_sql(
        ["fast", "table"], "phrase", phrase=["fast", "table"]
    )
    o["count_union_incl_excl"] = f"""
WITH toks AS (SELECT * FROM {_TOKS}),
a AS (SELECT DISTINCT doc_id FROM toks WHERE term = 'fast'),
b AS (SELECT DISTINCT doc_id FROM toks WHERE term = 'table'),
i AS (SELECT doc_id FROM a INTERSECT SELECT doc_id FROM b)
SELECT (SELECT count(*) FROM a)::BIGINT AS n_a,
       (SELECT count(*) FROM b)::BIGINT AS n_b,
       (SELECT count(*) FROM i)::BIGINT AS n_and,
       ((SELECT count(*) FROM a) + (SELECT count(*) FROM b)
        - (SELECT count(*) FROM i))::BIGINT AS n_or
"""
    o["facet_count_lang"] = f"""
SELECT lang, count(*)::BIGINT AS n FROM documents
WHERE doc_id IN (SELECT DISTINCT doc_id FROM {_TOKS} WHERE term = 'fast')
GROUP BY lang
"""
    o["facet_range_nchars"] = """
SELECT CASE WHEN n_chars < 100 THEN '0-99'
            WHEN n_chars < 200 THEN '100-199'
            WHEN n_chars < 300 THEN '200-299'
            ELSE '300+' END AS bucket,
       count(*)::BIGINT AS n
FROM documents GROUP BY 1
"""
    o["facet_range_cumulative"] = """
WITH base AS (
  SELECT (n_chars // 100) * 100 AS bucket_lo, count(*)::BIGINT AS n
  FROM documents GROUP BY 1)
SELECT bucket_lo, n,
       sum(n) OVER (ORDER BY bucket_lo
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)::BIGINT
         AS n_cumulative
FROM base
"""
    o["facet_minmax"] = (
        "SELECT lang, min(n_chars)::BIGINT AS min_chars, "
        "max(n_chars)::BIGINT AS max_chars FROM documents GROUP BY lang"
    )
    o["multikey_sort"] = f"""
WITH scored AS ({_bm25_sql(["dup"], "union", top_k=1000000)})
SELECT d.doc_id, d.lang, s.score
FROM documents d JOIN scored s ON d.doc_id = s.docid
ORDER BY d.lang ASC, s.score DESC, d.doc_id ASC LIMIT 20
"""
    o["delete_filter"] = _bm25_sql(
        ["fast", "table"], "intersection", docs_where="doc_id % 7 <> 0"
    )
    o["get_document"] = f"""
WITH top AS ({_bm25_sql(["fast", "table"], "intersection", top_k=5)})
SELECT d.doc_id, t.score, d.lang, d.source, d.n_chars
FROM top t JOIN documents d ON d.doc_id = t.docid
"""
    o["iterator_skip_take"] = (
        "SELECT doc_id, source, n_chars FROM documents "
        "ORDER BY doc_id ASC LIMIT 25 OFFSET 100"
    )
    o["empty_query_facets"] = (
        "SELECT source, count(*)::BIGINT AS n FROM documents GROUP BY source"
    )
    _norm = "regexp_replace(trim(lower(text)), '\\s+', ' ', 'g')"
    o["dedup_fingerprint"] = (
        f"SELECT doc_id, md5({_norm}) AS fingerprint FROM documents "
        "WHERE doc_id < 30"
    )
    o["dedup_exact_groups"] = f"""
SELECT md5({_norm}) AS fingerprint, count(*)::BIGINT AS dup_count,
       min(doc_id) AS keeper_docid
FROM documents GROUP BY 1 HAVING count(*) > 1
"""
    o["dedup_jaccard_pairs"] = """
WITH docs AS (SELECT doc_id, list_filter(string_split(trim(lower(text)), ' '),
                                         x -> x <> '') AS toks
              FROM documents WHERE doc_id < 60),
sh AS (SELECT DISTINCT doc_id,
              array_to_string(toks[i:i+2], ' ') AS shingle
       FROM (SELECT doc_id, toks,
                    unnest(range(1, greatest(len(toks) - 2, 0) + 1)) AS i
             FROM docs)),
sizes AS (SELECT doc_id, count(*) AS n_sh FROM sh GROUP BY doc_id),
inter AS (SELECT a.doc_id AS docid_a, b.doc_id AS docid_b, count(*) AS n_common
          FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
          GROUP BY 1, 2)
SELECT docid_a, docid_b,
       round(n_common::DOUBLE / (sa.n_sh + sb.n_sh - n_common), 6) AS jaccard
FROM inter
JOIN sizes sa ON sa.doc_id = docid_a
JOIN sizes sb ON sb.doc_id = docid_b
WHERE round(n_common::DOUBLE / (sa.n_sh + sb.n_sh - n_common), 6) >= 0.01
"""
    o["quality_bigram_nll"] = """
WITH docs AS (SELECT doc_id, list_filter(string_split(trim(lower(text)), ' '),
                                         x -> x <> '') AS toks
              FROM documents),
bg AS (SELECT doc_id, toks[i] AS w1, toks[i+1] AS w2
       FROM (SELECT doc_id, toks,
                    unnest(range(1, greatest(len(toks) - 1, 0) + 1)) AS i
             FROM docs)),
c12 AS (SELECT w1, w2, count(*) AS c12 FROM bg GROUP BY 1, 2),
c1 AS (SELECT w1, count(*) AS c1 FROM bg GROUP BY 1),
v AS (SELECT count(DISTINCT tok) AS v
      FROM (SELECT unnest(toks) AS tok FROM docs)),
lp AS (SELECT bg.doc_id,
              (-ln((c12.c12 + 1.0) / (c1.c1 + v.v)))::REAL AS nlp
       FROM bg
       JOIN c12 ON bg.w1 = c12.w1 AND bg.w2 = c12.w2
       JOIN c1 ON bg.w1 = c1.w1
       CROSS JOIN v),
agg AS (SELECT doc_id, list_sort(list(nlp)) AS arr FROM lp GROUP BY doc_id)
SELECT doc_id AS docid, len(arr)::BIGINT AS n_bigrams,
       round(list_sum(list_transform(arr, x -> x::DOUBLE)) / len(arr), 4)
         AS nll
FROM agg ORDER BY docid
"""
    _thr = {
        "en": int(0.5 * (1 << 60)),
        "de": int(0.25 * (1 << 60)),
        "fr": int(0.125 * (1 << 60)),
        "es": int(1.0 * (1 << 60)),
        "zh": int(0.0625 * (1 << 60)),
    }
    o["sample_stratified"] = f"""
SELECT doc_id, lang FROM documents
WHERE ('0x' || substr(md5('42|' || doc_id::VARCHAR), 1, 15))::UBIGINT::BIGINT
      < (CASE lang WHEN 'en' THEN {_thr['en']} WHEN 'de' THEN {_thr['de']}
               WHEN 'fr' THEN {_thr['fr']} WHEN 'es' THEN {_thr['es']}
               WHEN 'zh' THEN {_thr['zh']} ELSE 0 END)
ORDER BY doc_id
"""
    o["pack_sequences"] = """
WITH d AS (SELECT doc_id, lang,
  len(list_filter(string_split(trim(lower(text)), ' '),
      x -> x <> ''))::BIGINT AS n_tokens
  FROM documents),
c AS (SELECT doc_id, lang, n_tokens,
  coalesce(sum(n_tokens) OVER (PARTITION BY lang ORDER BY doc_id
      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cb
  FROM d)
SELECT doc_id, lang, n_tokens,
       (cb // 200)::BIGINT AS pack_id, (cb % 200)::BIGINT AS pack_offset
FROM c ORDER BY doc_id
"""
    o["dedup_spans"] = """
WITH docs AS (SELECT doc_id, list_filter(string_split(trim(lower(text)), ' '),
                                         x -> x <> '') AS toks
              FROM documents WHERE doc_id < 80),
grams AS (SELECT doc_id, i - 1 AS pos,
                 array_to_string(toks[i:i+2], ' ') AS gram
          FROM (SELECT doc_id, toks,
                       unnest(range(1, greatest(len(toks) - 2, 0) + 1)) AS i
                FROM docs)),
dup AS (SELECT gram FROM grams GROUP BY gram
        HAVING count(DISTINCT doc_id) >= 2),
hits AS (SELECT doc_id, pos AS s, pos + 2 AS e
         FROM grams JOIN dup USING (gram)),
isl AS (SELECT doc_id, s, e,
        CASE WHEN s > max(e) OVER (PARTITION BY doc_id ORDER BY s
             ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) + 1
             THEN 1 ELSE 0 END AS ni
        FROM hits),
run AS (SELECT doc_id, s, e,
        sum(ni) OVER (PARTITION BY doc_id ORDER BY s
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS island
        FROM isl)
SELECT doc_id AS docid, min(s)::BIGINT AS span_start,
       max(e)::BIGINT AS span_end
FROM run GROUP BY doc_id, island ORDER BY docid, span_start
"""
    o["quality_c4"] = r"""
WITH t0 AS (SELECT doc_id,
  replace(replace(replace(text,
    ' merge ', '.' || chr(10)),
    ' window ', chr(10)),
    ' stream ', ' javascript.' || chr(10)) AS t3
  FROM documents WHERE doc_id < 300),
t1 AS (SELECT doc_id,
  (CASE WHEN doc_id % 11 = 0
        THEN t3 || chr(10) || 'lorem ipsum dolor sit.' ELSE t3 END) AS t4
  FROM t0),
t2 AS (SELECT doc_id,
  (CASE WHEN doc_id % 7 = 3
        THEN t4 || chr(10) || 'code { brace }.' ELSE t4 END) || '.' AS txt
  FROM t1),
lines AS (SELECT doc_id, txt,
  list_filter(string_split(txt, chr(10)),
    l -> regexp_matches(rtrim(l), '[.!?"]$')
         AND len(list_filter(string_split(l, ' '), w -> w <> '')) >= 5
         AND NOT contains(lower(l), 'javascript')) AS kept
  FROM t2),
j AS (SELECT doc_id, txt, kept,
             -- DuckDB array_to_string([]) is NULL; Spark array_join is ''
             coalesce(array_to_string(kept, chr(10)), '') AS kt
      FROM lines)
SELECT doc_id, kt AS c4_text, len(kept)::BIGINT AS c4_n_lines,
  (length(kt) - length(translate(kt, '.!?', '')))::BIGINT
    AS c4_n_sentences,
  (CASE WHEN (length(kt) - length(translate(kt, '.!?', ''))) >= 3
         AND NOT contains(lower(txt), 'lorem ipsum')
         AND NOT contains(txt, '{') THEN 1 ELSE 0 END)::INT AS c4_keep
FROM j ORDER BY doc_id
"""
    o["url_canonicalize"] = r"""
WITH u AS (SELECT doc_id,
  (CASE WHEN doc_id % 2 = 0 THEN 'HTTP' ELSE 'https' END)
  || '://Host' || (doc_id % 7)::VARCHAR || '.Example.COM'
  || (CASE doc_id % 4 WHEN 0 THEN ':80' WHEN 1 THEN ':443'
                      WHEN 2 THEN ':8080' ELSE '' END)
  || (CASE WHEN doc_id % 3 = 0 THEN ''
           ELSE '/Dir/' || doc_id::VARCHAR END)
  || '?utm_source=feed&b=' || (doc_id % 5)::VARCHAR || '&a=1'
  || (CASE WHEN doc_id % 6 = 0 THEN '&gclid=XyZ' ELSE '' END)
  || (CASE WHEN doc_id % 2 = 1 THEN '#Sec' || doc_id::VARCHAR
           ELSE '' END) AS url
  FROM documents WHERE doc_id < 200),
s1 AS (SELECT doc_id, url,
              regexp_replace(trim(url), '#.*$', '') AS s FROM u),
p1 AS (SELECT *,
  lower(regexp_extract(s, '^([A-Za-z][A-Za-z0-9+.-]*)://', 1)) AS scheme,
  regexp_replace(s, '^[A-Za-z][A-Za-z0-9+.-]*://', '') AS rest FROM s1),
p2 AS (SELECT *,
  regexp_extract(rest, '^([^/?]*)', 1) AS authority,
  regexp_extract(rest, '^[^/?]*([^?]*)', 1) AS path,
  regexp_extract(rest, '\?(.*)$', 1) AS query FROM p1),
p3 AS (SELECT *,
  lower(regexp_extract(authority, '^([^:]*)', 1)) AS host0,
  regexp_extract(authority, ':([0-9]+)$', 1) AS port FROM p2),
p4 AS (SELECT *,
  CASE WHEN port = '' THEN ''
       WHEN scheme = 'http' AND port = '80' THEN ''
       WHEN scheme = 'https' AND port = '443' THEN ''
       ELSE ':' || port END AS portpart,
  array_to_string(list_sort(list_filter(string_split(query, '&'),
    p -> p <> '' AND NOT regexp_matches(p,
      '^(utm_[^=&]*|gclid|fbclid|msclkid|ref_src)(=[^&]*)?$'))),
    '&') AS qjoin
  FROM p3)
SELECT doc_id, url,
  CASE WHEN scheme = '' THEN s
       ELSE scheme || '://' || host0 || portpart
            || (CASE WHEN path = '' THEN '/' ELSE path END)
            || (CASE WHEN qjoin = '' THEN '' ELSE '?' || qjoin END)
  END AS canon,
  CASE WHEN scheme = '' THEN '' ELSE host0 END AS host
FROM p4 ORDER BY doc_id
"""
    # connected components over the same Jaccard pair set: recursive
    # reachability → min reachable doc_id per node (the Spark side
    # computes the identical fixpoint via large-star/small-star)
    o["dedup_components"] = """
WITH RECURSIVE docs AS (SELECT doc_id, list_filter(string_split(trim(lower(text)), ' '),
                                         x -> x <> '') AS toks
              FROM documents WHERE doc_id < 60),
sh AS (SELECT DISTINCT doc_id,
              array_to_string(toks[i:i+2], ' ') AS shingle
       FROM (SELECT doc_id, toks,
                    unnest(range(1, greatest(len(toks) - 2, 0) + 1)) AS i
             FROM docs)),
sizes AS (SELECT doc_id, count(*) AS n_sh FROM sh GROUP BY doc_id),
inter AS (SELECT a.doc_id AS docid_a, b.doc_id AS docid_b, count(*) AS n_common
          FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
          GROUP BY 1, 2),
pairs AS (SELECT docid_a AS a, docid_b AS b
          FROM inter
          JOIN sizes sa ON sa.doc_id = docid_a
          JOIN sizes sb ON sb.doc_id = docid_b
          WHERE round(n_common::DOUBLE / (sa.n_sh + sb.n_sh - n_common), 6)
                >= 0.01),
nodes AS (SELECT a AS n FROM pairs UNION SELECT b FROM pairs),
edges AS (SELECT a AS u, b AS v FROM pairs UNION SELECT b, a FROM pairs),
reach AS (SELECT n, n AS r FROM nodes
          UNION
          SELECT e.u AS n, reach.r FROM edges e JOIN reach ON reach.n = e.v)
SELECT n AS docid, min(r) AS component FROM reach GROUP BY n ORDER BY docid
"""
    o["dedup_simhash"] = """
WITH docs AS (SELECT doc_id, list_filter(string_split(lower(text), ' '),
                                         x -> x <> '') AS toks
              FROM documents WHERE doc_id < 30),
tcnt AS (SELECT doc_id, t.tok AS term, count(*) AS cnt
         FROM docs, unnest(toks) AS t(tok) GROUP BY 1, 2),
th AS (SELECT doc_id, term, cnt,
              ('0x' || substr(md5(term), 1, 16))::UBIGINT AS h
       FROM tcnt),
bits AS (SELECT doc_id, b.b AS bit,
                sum(CASE WHEN (h >> b.b) & 1 = 1 THEN cnt ELSE -cnt END) AS w
         FROM th CROSS JOIN generate_series(0, 63) AS b(b)
         GROUP BY 1, 2)
SELECT doc_id,
       sum(CASE WHEN w > 0 THEN
             CASE WHEN bit = 63 THEN -9223372036854775808
                  ELSE (1::BIGINT << bit) END
           ELSE 0 END)::BIGINT AS simhash
FROM bits GROUP BY doc_id
"""
    # MinHash: the md5-based universal-hash scheme (dedup.py) is fully
    # SQL-expressible — the 128 (a, b) coefficients are deterministic
    # constants embedded as a VALUES table.
    from seekstorm_spark.functions.dedup import MINHASH_A, MINHASH_B

    _ab_rows = ",".join(
        f"({i},{int(a)},{int(b)})"
        for i, (a, b) in enumerate(zip(MINHASH_A, MINHASH_B))
    )
    _mh_ctes = f"""
ab(i, a, b) AS (VALUES {_ab_rows}),
mh_docs AS (SELECT doc_id, list_filter(string_split(lower(text), ' '),
                                       x -> x <> '') AS toks
            FROM documents WHERE doc_id < {{maxid}}),
sh3 AS (SELECT DISTINCT doc_id, array_to_string(toks[i:i+2], ' ') AS shingle
        FROM (SELECT doc_id, toks,
                     unnest(range(1, greatest(len(toks) - 2, 0) + 1)) AS i
              FROM mh_docs WHERE len(toks) >= 3)),
sh0 AS (SELECT doc_id, array_to_string(toks, ' ') AS shingle
        FROM mh_docs WHERE len(toks) < 3),
shu AS (SELECT * FROM sh3 UNION ALL SELECT * FROM sh0),
hx AS (SELECT doc_id,
              (('0x' || substr(md5(shingle), 1, 16))::UBIGINT >> 33)::BIGINT AS x
       FROM shu),
hv AS (SELECT doc_id, ab.i, min((ab.a * hx.x + ab.b)
                                % 2305843009213693951) AS mh
       FROM hx CROSS JOIN ab GROUP BY doc_id, ab.i)
"""
    o["dedup_minhash_sig"] = (
        "WITH " + _mh_ctes.format(maxid=30)
        + "SELECT doc_id, i::BIGINT AS i, mh::BIGINT AS mh FROM hv"
    )
    o["dedup_minhash_candidates"] = (
        "WITH " + _mh_ctes.format(maxid=60)
        + """,
bands AS (SELECT doc_id, (i // 4) AS band,
                 md5(string_agg(mh::VARCHAR, ',' ORDER BY i)) AS bucket
          FROM hv GROUP BY doc_id, (i // 4))
SELECT DISTINCT a.doc_id AS docid_a, b.doc_id AS docid_b
FROM bands a JOIN bands b
  ON a.band = b.band AND a.bucket = b.bucket AND a.doc_id < b.doc_id
ORDER BY docid_a, docid_b
"""
    )

    # incremental dedup: corpus (doc_id < 100) band rows persisted
    # once; the probe batch (docs 100-159 + exact copies of docs < 30
    # at +100000) joins on (band, bucket). The oracle recomputes BOTH
    # sides' bands — the store content is deterministic given the
    # corpus, so store-vs-recompute equality is part of what the row
    # proves.
    o["dedup_incremental_minhash"] = f"""
WITH ab(i, a, b) AS (VALUES {_ab_rows}),
srcdocs AS (
  SELECT 0 AS src, doc_id, text FROM documents WHERE doc_id < 100
  UNION ALL
  SELECT 1, doc_id, text FROM documents
  WHERE doc_id >= 100 AND doc_id < 160
  UNION ALL
  SELECT 1, doc_id + 100000, text FROM documents WHERE doc_id < 30),
mh_docs AS (SELECT src, doc_id,
                   list_filter(string_split(lower(text), ' '),
                               x -> x <> '') AS toks
            FROM srcdocs),
sh3 AS (SELECT DISTINCT src, doc_id,
               array_to_string(toks[i:i+2], ' ') AS shingle
        FROM (SELECT src, doc_id, toks,
                     unnest(range(1, greatest(len(toks) - 2, 0) + 1)) AS i
              FROM mh_docs WHERE len(toks) >= 3)),
sh0 AS (SELECT src, doc_id, array_to_string(toks, ' ') AS shingle
        FROM mh_docs WHERE len(toks) < 3),
shu AS (SELECT * FROM sh3 UNION ALL SELECT * FROM sh0),
hx AS (SELECT src, doc_id,
              (('0x' || substr(md5(shingle), 1, 16))::UBIGINT >> 33)::BIGINT
                AS x
       FROM shu),
hv AS (SELECT src, doc_id, ab.i, min((ab.a * hx.x + ab.b)
                                     % 2305843009213693951) AS mh
       FROM hx CROSS JOIN ab GROUP BY src, doc_id, ab.i),
bands AS (SELECT src, doc_id, (i // 4) AS band,
                 md5(string_agg(mh::VARCHAR, ',' ORDER BY i)) AS bucket
          FROM hv GROUP BY src, doc_id, (i // 4))
SELECT DISTINCT b.doc_id AS batch_docid, c.doc_id AS corpus_docid
FROM bands b JOIN bands c ON b.band = c.band AND b.bucket = c.bucket
WHERE b.src = 1 AND c.src = 0
ORDER BY batch_docid, corpus_docid
"""

    _robots_rules = ", ".join(
        f"('h{i}', '/d{i}/', false), ('h{i}', '/d{i}/ok', true)"
        for i in range(4)
    )
    o["crawl_robots_filter"] = f"""
WITH pages AS (
  SELECT doc_id,
    'h' || (doc_id % 5)::VARCHAR AS host,
    CASE WHEN doc_id % 3 = 0
           THEN '/d' || (doc_id % 5)::VARCHAR || '/okpage'
                || doc_id::VARCHAR
         WHEN doc_id % 3 = 1
           THEN '/d' || (doc_id % 5)::VARCHAR || '/x' || doc_id::VARCHAR
         ELSE '/free/' || doc_id::VARCHAR END AS path
  FROM documents WHERE doc_id < 200),
rules(host, prefix, allow) AS (VALUES {_robots_rules}),
m AS (SELECT p.doc_id, r.allow,
             row_number() OVER (PARTITION BY p.doc_id
               ORDER BY length(r.prefix) DESC, r.allow DESC) AS rn
      FROM pages p JOIN rules r
        ON p.host = r.host AND starts_with(p.path, r.prefix))
SELECT p.doc_id, coalesce(m.allow, true) AS allowed
FROM pages p LEFT JOIN m ON m.doc_id = p.doc_id AND m.rn = 1
ORDER BY p.doc_id
"""

    o["ingest_sitemap"] = """
WITH u AS (
  SELECT 'url' AS kind,
         'http://site.test/page' || doc_id::VARCHAR AS loc,
         CASE WHEN doc_id >= 60 AND doc_id % 4 = 0 THEN NULL
              ELSE strftime(DATE '2024-01-01'
                            + INTERVAL (doc_id) DAY, '%Y-%m-%d')
         END AS lastmod
  FROM documents WHERE doc_id < 120
  UNION ALL
  SELECT 'sitemap', 'http://site.test/sm0.xml', '2024-06-01'
  UNION ALL
  SELECT 'sitemap', 'http://site.test/sm1.xml.gz', '2024-06-01')
SELECT kind, loc, lastmod FROM u ORDER BY kind, loc
"""

    o["ann_cosine_topk"] = """
WITH q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = 0),
scored AS (
  SELECT e.vec_id,
         round(
           list_sum(list_transform(range(1, len(e.embedding) + 1),
             i -> e.embedding[i]::DOUBLE * q.qv[i]::DOUBLE))
           / (sqrt(list_sum(list_transform(e.embedding, x -> x::DOUBLE * x::DOUBLE)))
              * sqrt(list_sum(list_transform(q.qv, x -> x::DOUBLE * x::DOUBLE)))),
         4) AS cos_sim
  FROM embeddings e CROSS JOIN q WHERE e.vec_id <> 0)
SELECT vec_id, cos_sim FROM scored
ORDER BY cos_sim DESC, vec_id ASC LIMIT 10
"""
    # IVF probed with n_probe = n_cells covers every cell, so its
    # result is exactly the exhaustive cosine top-k — same oracle
    o["ann_ivf_topk"] = o["ann_cosine_topk"]
    o["ann_dot_topk"] = """
WITH q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = 0)
SELECT e.vec_id,
       round(list_sum(list_transform(range(1, len(e.embedding) + 1),
         i -> e.embedding[i]::DOUBLE * q.qv[i]::DOUBLE)), 4) AS dot
FROM embeddings e CROSS JOIN q WHERE e.vec_id <> 0
ORDER BY dot DESC, vec_id ASC LIMIT 10
"""
    o["ann_euclidean_topk"] = """
WITH q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = 0)
SELECT e.vec_id,
       round(sqrt(list_sum(list_transform(range(1, len(e.embedding) + 1),
         i -> (e.embedding[i]::DOUBLE - q.qv[i]::DOUBLE)
              * (e.embedding[i]::DOUBLE - q.qv[i]::DOUBLE)))), 4) AS dist
FROM embeddings e CROSS JOIN q WHERE e.vec_id <> 0
ORDER BY dist ASC, vec_id ASC LIMIT 10
"""
    # i8 SQ: scale = max|x|/127 per vector, codes = round(x/scale);
    # cosine over the integer codes (the scale cancels)
    o["ann_quantized_cosine"] = """
WITH q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = 0),
codes AS (
  SELECT vec_id,
         list_transform(embedding,
           x -> CASE WHEN s = 0 THEN 0.0
                     ELSE round(x::DOUBLE / s, 0) END) AS c
  FROM (SELECT vec_id, embedding,
               list_max(list_transform(embedding,
                        x -> abs(x::DOUBLE))) / 127.0 AS s
        FROM embeddings WHERE vec_id <> 0)),
scored AS (
  SELECT codes.vec_id,
         round(
           list_sum(list_transform(range(1, len(codes.c) + 1),
             i -> codes.c[i] * q.qv[i]::DOUBLE))
           / (sqrt(list_sum(list_transform(codes.c, x -> x * x)))
              * sqrt(list_sum(list_transform(q.qv,
                     x -> x::DOUBLE * x::DOUBLE)))),
         4) AS cos_sim
  FROM codes CROSS JOIN q)
SELECT vec_id, cos_sim FROM scored
ORDER BY cos_sim DESC, vec_id ASC LIMIT 10
"""
    # affine SQ: round((x−min)/s) reconstructed as min + code·s —
    # quantizer mirrored bit-for-bit, cosine over the reconstruction
    o["ann_affine_cosine"] = """
WITH q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = 0),
qt AS (
  SELECT vec_id, embedding,
         list_min(list_transform(embedding, x -> x::DOUBLE)) AS zero,
         (list_max(list_transform(embedding, x -> x::DOUBLE))
          - list_min(list_transform(embedding, x -> x::DOUBLE))) / 255.0 AS s
  FROM embeddings WHERE vec_id <> 0),
deq AS (
  SELECT vec_id,
         list_transform(embedding,
           x -> CASE WHEN s = 0 THEN zero
                     ELSE zero + round((x::DOUBLE - zero) / s, 0) * s
                END) AS v
  FROM qt),
scored AS (
  SELECT deq.vec_id,
         round(
           list_sum(list_transform(range(1, len(deq.v) + 1),
             i -> deq.v[i] * q.qv[i]::DOUBLE))
           / (sqrt(list_sum(list_transform(deq.v, x -> x * x)))
              * sqrt(list_sum(list_transform(q.qv,
                     x -> x::DOUBLE * x::DOUBLE)))),
         4) AS cos_sim
  FROM deq CROSS JOIN q)
SELECT vec_id, cos_sim FROM scored
ORDER BY cos_sim DESC, vec_id ASC LIMIT 10
"""

    # TurboQuant: the whole quantizer re-derived in SQL — normalize,
    # ×sign-mask (seeded deterministic constant, inlined as ±1
    # literals), 6 FWHT butterfly passes (each output element is ONE
    # add/sub — no accumulation-order ambiguity), ÷√64, scale =
    # (‖h‖/√64)/32 clamped at 1e-8, round-half-away-from-zero clamp
    # ±127; similarity = Σ code·code × s_vec × s_query. Applied to the
    # query row (vec_id=0) through the SAME pipeline.
    def _tq_sql(dim: int = 64) -> str:
        from seekstorm_spark.functions.simsearch import tq_sign_mask

        mask = tq_sign_mask(dim)
        mask_lit = (
            "["
            + ",".join("1.0" if m > 0 else "-1.0" for m in mask)
            + "]::DOUBLE[]"
        )
        ctes = [
            f"""tq0 AS (
  SELECT vec_id,
         list_transform(range(0, {dim}), j ->
           (CASE WHEN nrm = 0 THEN 0.0
                 ELSE embedding[j+1]::DOUBLE / sqrt(nrm) END)
           * ({mask_lit})[j+1]) AS a
  FROM (SELECT vec_id, embedding,
               list_sum(list_transform(embedding,
                        x -> x::DOUBLE * x::DOUBLE)) AS nrm
        FROM embeddings))"""
        ]
        h, p = 1, 0
        while h < dim:
            p += 1
            ctes.append(
                f"""tq{p} AS (
  SELECT vec_id, list_transform(range(0, {dim}), j ->
    CASE WHEN (j % {2 * h}) < {h} THEN a[j+1] + a[j+{h}+1]
         ELSE a[j-{h}+1] - a[j+1] END) AS a FROM tq{p - 1})"""
            )
            h *= 2
        ctes.append(
            f"""tqs AS (
  SELECT vec_id, hh,
         greatest(sqrt(list_sum(list_transform(hh, x -> x * x)))
                  / sqrt({dim}.0) / 32.0, 1e-8) AS s
  FROM (SELECT vec_id,
               list_transform(a, x -> x / sqrt({dim}.0)) AS hh
        FROM tq{p}))"""
        )
        ctes.append(
            """tqc AS (
  SELECT vec_id, s,
         list_transform(hh, x ->
           greatest(least(floor(abs(x / s) + 0.5) * sign(x / s),
                          127.0), -127.0)) AS c
  FROM tqs)"""
        )
        ctes.append("tqq AS (SELECT c AS qc, s AS qs FROM tqc WHERE vec_id = 0)")
        return (
            "WITH "
            + ",\n".join(ctes)
            + f"""
SELECT t.vec_id,
       round(list_sum(list_transform(range(1, {dim + 1}),
             i -> t.c[i] * tqq.qc[i])) * t.s * tqq.qs, 4) AS cos_sim
FROM tqc t CROSS JOIN tqq WHERE t.vec_id <> 0
ORDER BY cos_sim DESC, vec_id ASC LIMIT 10
"""
        )

    o["ann_turboquant_topk"] = _tq_sql()

    # LSH-ANN: hyperplanes are seeded deterministic constants — embed
    # them as double[] literals and recompute signatures in SQL; the
    # candidate set = vectors with hamming(sig, qsig) <= 1, identical
    # to the engine's probed partitions.
    def _sig_sql(vec_expr: str, n_planes: int = 8, dim: int = 64) -> str:
        from seekstorm_spark.functions.simsearch import _hyperplanes

        planes = _hyperplanes(dim, n_planes, seed=1234)
        parts = []
        for b in range(n_planes):
            lits = "[" + ",".join(repr(float(x)) for x in planes[b]) + "]"
            parts.append(
                f"(CASE WHEN list_sum(list_transform(range(1, {dim + 1}), "
                f"i -> {vec_expr}[i]::DOUBLE * ({lits}::DOUBLE[])[i])) > 0 "
                f"THEN {1 << b} ELSE 0 END)"
            )
        return " + ".join(parts)

    o["ann_lsh_topk"] = f"""
WITH q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = 0),
qsig AS (SELECT {_sig_sql('qv')} AS sig FROM q),
sigs AS (SELECT vec_id, embedding, {_sig_sql('embedding')} AS sig
         FROM embeddings WHERE vec_id <> 0),
cand AS (SELECT s.vec_id, s.embedding FROM sigs s, qsig
         WHERE bit_count(xor(s.sig::BIGINT, qsig.sig::BIGINT)) <= 1),
scored AS (
  SELECT c.vec_id,
         round(
           list_sum(list_transform(range(1, len(c.embedding) + 1),
             i -> c.embedding[i]::DOUBLE * q.qv[i]::DOUBLE))
           / (sqrt(list_sum(list_transform(c.embedding, x -> x::DOUBLE * x::DOUBLE)))
              * sqrt(list_sum(list_transform(q.qv, x -> x::DOUBLE * x::DOUBLE)))),
         4) AS cos_sim
  FROM cand c CROSS JOIN q)
SELECT vec_id, cos_sim FROM scored
ORDER BY cos_sim DESC, vec_id ASC LIMIT 10
"""

    # multi-vector doc-level max-sim over exploded chunk vectors;
    # float64 cosine in the same sequential fold order as the kernel,
    # max is order-free, round after aggregation
    o["ann_chunked_topk"] = """
WITH q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = 0),
scored AS (
  SELECT e.vec_id // 4 AS docid,
         list_sum(list_transform(range(1, len(e.embedding) + 1),
           i -> e.embedding[i]::DOUBLE * q.qv[i]::DOUBLE))
         / (sqrt(list_sum(list_transform(e.embedding, x -> x::DOUBLE * x::DOUBLE)))
            * sqrt(list_sum(list_transform(q.qv, x -> x::DOUBLE * x::DOUBLE)))) AS cos
  FROM embeddings e CROSS JOIN q WHERE e.vec_id <> 0)
SELECT docid, round(max(cos), 4) AS sim FROM scored GROUP BY docid
ORDER BY sim DESC, docid ASC LIMIT 10
"""

    # Model2Vec inference mirrored end-to-end in SQL: regenerate the
    # fixture's md5-seeded token vectors, mean-pool per doc over piece
    # occurrences, L2-normalize in f64, CAST each component to FLOAT
    # (the model stores f32), then cosine in f64 — the exact pipeline
    # StaticEmbedder.encode + cosine_col run.
    _m2v_c = (
        "(('0x' || substr(md5(tok || '|' || j::VARCHAR), 1, 8))::UBIGINT"
        " / 4294967296.0) * 2.0 - 1.0"
    )
    _m2v_vocab_vals = ", ".join(f"('{t}')" for t in M2V_VOCAB)
    _m2v_q_vals = ", ".join(f"('{t}')" for t in M2V_QUERY_TOKS)
    o["ann_model2vec_topk"] = f"""
WITH vocab(tok) AS (VALUES {_m2v_vocab_vals}),
qtoks(tok) AS (VALUES {_m2v_q_vals}),
dtoks AS (
  SELECT d.doc_id, t.tok
  FROM (SELECT doc_id, lower(text) AS txt FROM documents
        WHERE doc_id < 300) d,
       unnest(regexp_extract_all(d.txt, '[a-z0-9]+')) AS t(tok)
  WHERE t.tok IN (SELECT tok FROM vocab)),
comp AS (
  SELECT doc_id, j, avg({_m2v_c}) AS m
  FROM dtoks, range({M2V_DIM}) r(j) GROUP BY doc_id, j),
nrm AS (SELECT doc_id, sqrt(sum(m * m)) AS nv FROM comp GROUP BY doc_id),
vecs AS (SELECT c.doc_id, c.j, CAST(c.m / n.nv AS FLOAT) AS x
         FROM comp c JOIN nrm n USING (doc_id)),
qcomp AS (SELECT j, avg({_m2v_c}) AS m
          FROM qtoks, range({M2V_DIM}) r(j) GROUP BY j),
qvec AS (SELECT j, CAST(m / (SELECT sqrt(sum(m * m)) FROM qcomp) AS FLOAT)
              AS x FROM qcomp),
dots AS (
  SELECT v.doc_id,
         sum(v.x::DOUBLE * q.x::DOUBLE) AS dot,
         sqrt(sum(v.x::DOUBLE * v.x::DOUBLE)) AS nv
  FROM vecs v JOIN qvec q USING (j) GROUP BY v.doc_id)
SELECT doc_id,
       round(dot / (nv * (SELECT sqrt(sum(x::DOUBLE * x::DOUBLE))
                          FROM qvec)), 4) AS sim
FROM dots ORDER BY sim DESC, doc_id ASC LIMIT 10
"""

    # hybrid RRF through the engine: extend the f32-exact WAND CTE
    # chain (whose last CTE is `scored`) with the ANN-probe CTEs, rank
    # both top-10 lists, fuse with 1/(0.6+rank) in double.
    # ``qid`` picks the query vector (the ANN index itself always
    # excludes vec_id 0, mirroring the AnnIndex the driver row builds).
    def _hybrid_tail(qid: int) -> str:
        return hybrid_tail.replace(
            "WHERE vec_id = 0),", f"WHERE vec_id = {qid}),", 1
        )

    hybrid_tail = f"""
, q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = 0),
qsig AS (SELECT {_sig_sql('qv')} AS sig FROM q),
sigs AS (SELECT vec_id, embedding, {_sig_sql('embedding')} AS sig
         FROM embeddings WHERE vec_id <> 0),
cand AS (SELECT s.vec_id, s.embedding FROM sigs s, qsig
         WHERE bit_count(xor(s.sig::BIGINT, qsig.sig::BIGINT)) <= 1),
vscored AS (
  SELECT c.vec_id,
         round(
           list_sum(list_transform(range(1, len(c.embedding) + 1),
             i -> c.embedding[i]::DOUBLE * q.qv[i]::DOUBLE))
           / (sqrt(list_sum(list_transform(c.embedding, x -> x::DOUBLE * x::DOUBLE)))
              * sqrt(list_sum(list_transform(q.qv, x -> x::DOUBLE * x::DOUBLE)))),
         4) AS cos_sim
  FROM cand c CROSS JOIN q),
vtop AS (SELECT vec_id AS docid, cos_sim FROM vscored
         ORDER BY cos_sim DESC, vec_id ASC LIMIT 10),
vrank AS (SELECT docid,
                 row_number() OVER (ORDER BY cos_sim DESC, docid ASC) AS vr
          FROM vtop),
ltop AS (SELECT docid, raw FROM scored ORDER BY raw DESC, docid ASC LIMIT 10),
lrank AS (SELECT docid,
                 row_number() OVER (ORDER BY raw DESC, docid ASC) AS lr
          FROM ltop)
SELECT docid, rrf_score FROM (
  SELECT COALESCE(l.docid, v.docid) AS docid,
         round(COALESCE(1.0::DOUBLE / (0.6::DOUBLE + l.lr), 0.0::DOUBLE)
               + COALESCE(1.0::DOUBLE / (0.6::DOUBLE + v.vr), 0.0::DOUBLE),
               6) AS rrf_score
  FROM lrank l FULL OUTER JOIN vrank v ON l.docid = v.docid)
ORDER BY rrf_score DESC, docid ASC LIMIT 10
"""
    o["wand_hybrid_rrf"] = _wand_bm25_sql(
        ["fast", "table"], "union", final_select=hybrid_tail
    )
    # batched hybrid: per (query, vector) pair the SAME single-query
    # hybrid SQL, tagged with its position (the Spark side is
    # search_many_hybrid — lexical side fused, per-query ANN probes
    # and RRF in one action, bit-identical per query to search())
    o["wand_multi_hybrid"] = "\nUNION ALL\n".join(
        f"SELECT {i} AS query_id, * FROM ("
        + _wand_bm25_sql(terms, "union", final_select=_hybrid_tail(i))
        + ")"
        for i, terms in enumerate(_MH_QUERY_TERMS)
    )
    # served from the frequent-term cache, which is bit-identical to
    # the kernel — same oracle as a live single-term WAND query
    o["wand_cached_frequent"] = _wand_bm25_sql(["fast"], "union")
    # top-10 by the numeric facet (asc, docid tiebreak), scores from
    # the same f32-exact chain
    o["wand_numeric_sort_pruned"] = _wand_bm25_sql(
        ["fast"], "union", final_select="""
SELECT s.docid, d.n_chars::DOUBLE AS n_chars,
       round(s.raw::DOUBLE, 4) AS score
FROM scored s JOIN documents d ON d.doc_id = s.docid
ORDER BY d.n_chars ASC, s.docid ASC LIMIT 10
""",
    )

    o["geo_radius"] = """
WITH pts AS (
  SELECT doc_id,
         (doc_id * 37 % 18000) / 100.0 - 90.0 AS lat,
         (doc_id * 73 % 36000) / 100.0 - 180.0 AS lon
  FROM documents),
d AS (
  SELECT doc_id,
         2.0 * 6371.0 * asin(sqrt(
           pow(sin(radians(48.8566 - lat) / 2), 2)
           + cos(radians(lat)) * cos(radians(48.8566))
             * pow(sin(radians(2.3522 - lon) / 2), 2))) AS dist_km
  FROM pts)
SELECT doc_id, round(dist_km, 4) AS dist_km FROM d
WHERE dist_km <= 3000.0 ORDER BY doc_id
"""

    en = ",".join(f"'{m}'" for m in _EN_MARKERS)
    o["text_quality"] = f"""
SELECT doc_id,
       len(list_filter(string_split(trim(text), ' '), x -> x <> ''))::BIGINT
         AS n_tokens,
       round((length(text) - length(regexp_replace(text, '[^\\w\\s]', '', 'g')))::DOUBLE
             / greatest(length(text), 1), 6) AS punct_ratio,
       round(len(list_filter(string_split(lower(text), ' '), x -> x IN ({en})))::DOUBLE
             / greatest(len(list_filter(string_split(trim(text), ' '), x -> x <> '')), 1),
             6) AS stopword_ratio,
       round((length(text) - (len(list_filter(string_split(trim(text), ' '),
                                              x -> x <> '')) - 1))::DOUBLE
             / greatest(len(list_filter(string_split(trim(text), ' '), x -> x <> '')), 1),
             6) AS mean_token_len
FROM documents WHERE doc_id < 50
"""
    marker_hits = {
        lang: f"len(list_intersect(list_distinct(string_split(lower(text), ' ')), "
        f"[{','.join(chr(39) + m + chr(39) for m in ms)}]))"
        for lang, ms in _LANG_MARKER_SQL.items()
    }
    o["lang_id"] = f"""
WITH h AS (SELECT doc_id,
    {marker_hits['en']} AS hen, {marker_hits['de']} AS hde,
    {marker_hits['fr']} AS hfr, {marker_hits['es']} AS hes
  FROM documents WHERE doc_id < 50)
SELECT doc_id,
  CASE WHEN hen >= hde AND hen >= hfr AND hen >= hes AND hen > 0 THEN 'en'
       WHEN hde >= hfr AND hde >= hes AND hde > 0 THEN 'de'
       WHEN hfr >= hes AND hfr > 0 THEN 'fr'
       WHEN hes > 0 THEN 'es'
       ELSE 'und' END AS pred_lang
FROM h
"""
    o["json_flatten"] = (
        "SELECT doc_id, source || ' ' || lang || ' tag1 ' || lang AS flat "
        "FROM documents WHERE doc_id < 30"
    )
    # Gopher-style repetition fractions — mirrors
    # textstats.repetition_features op-for-op (same split, same
    # filters, same greatest() clamps, round 6)
    o["quality_repetition"] = r"""
WITH ws AS (
  SELECT doc_id,
    list_filter(regexp_split_to_array(lower(trim(text)), '\s+'),
                x -> x <> '') AS w,
    list_filter(string_split(text, chr(10)), x -> trim(x) <> '') AS l
  FROM documents WHERE doc_id < 50),
bg AS (
  SELECT doc_id, w, l,
    CASE WHEN len(w) >= 2
      THEN list_transform(range(1, len(w)), i -> w[i] || ' ' || w[i+1])
      ELSE []::VARCHAR[] END AS b
  FROM ws)
SELECT doc_id,
  round(len(list_distinct(w))::DOUBLE / greatest(len(w), 1), 6)
    AS distinct_word_frac,
  round(coalesce(list_max(list_transform(list_distinct(w),
          x -> len(list_filter(w, y -> y = x)))), 0)::DOUBLE
        / greatest(len(w), 1), 6) AS top_word_frac,
  round(coalesce(list_max(list_transform(list_distinct(b),
          x -> len(list_filter(b, y -> y = x)))), 0)::DOUBLE
        / greatest(len(b), 1), 6) AS top_bigram_frac,
  CASE WHEN len(l) = 0 THEN 0.0
       ELSE round(1.0 - len(list_distinct(l))::DOUBLE / len(l), 6)
  END AS dup_line_frac
FROM bg ORDER BY doc_id
"""
    # PII redaction: the same pattern chain (Java-regex ∩ RE2 common
    # syntax) applied by DuckDB's RE2; counts by literal-token length
    # deltas, exactly as pii_features derives them
    from seekstorm_spark.functions.pii import PII_PATTERNS

    red_expr = "text"
    for _kind, pat, repl in PII_PATTERNS:
        red_expr = f"regexp_replace({red_expr}, '{pat}', '{repl}', 'g')"
    o["pii_redact"] = f"""
WITH synth AS (
  SELECT doc_id,
    substr(text, 1, 30) || ' user' || doc_id::VARCHAR
      || '@example.com (555) 123-'
      || lpad((doc_id % 10000)::VARCHAR, 4, '0')
      || ' 10.' || (doc_id % 256)::VARCHAR
      || '.0.' || ((doc_id * 7) % 256)::VARCHAR || ' end' AS text
  FROM documents WHERE doc_id < 40),
red AS (SELECT doc_id, {red_expr} AS redacted FROM synth)
SELECT doc_id, redacted,
  ((length(redacted) - length(replace(redacted, '<EMAIL>', ''))) / 7)::BIGINT
    AS n_email,
  ((length(redacted) - length(replace(redacted, '<IP>', ''))) / 4)::BIGINT
    AS n_ipv4,
  ((length(redacted) - length(replace(redacted, '<PHONE>', ''))) / 7)::BIGINT
    AS n_phone
FROM red ORDER BY doc_id
"""
    # text_normalize: the SQL mirror of functions/textnorm.py over the
    # same deterministic dirty prefix (decomposed e + combining acute,
    # zero-width space, BEL control, CRLF runs, trailing tab) — chr()
    # keeps every non-ASCII codepoint explicit.
    from seekstorm_spark.functions.textnorm import normalize_sql

    _dirty_sql = (
        "'Cafe' || chr(769) || chr(8203) || '  du' || chr(9) || 'rag'"
        " || chr(7) || 'on' || chr(13) || chr(10) || chr(13) || chr(10)"
        " || chr(13) || chr(10) || text || ' ' || chr(9)"
    )
    o["text_normalize"] = f"""
SELECT doc_id, {normalize_sql(_dirty_sql)} AS norm_text
FROM documents WHERE doc_id < 50 ORDER BY doc_id
"""

    from seekstorm_spark.functions.textstats import BPE_TOKEN_PATTERN

    # the pattern's leading apostrophe must be doubled inside the SQL
    # string literal
    bpe_sql_pat = BPE_TOKEN_PATTERN.replace("'", "''")
    o["token_count_bpe"] = f"""
SELECT doc_id,
  len(list_filter(regexp_extract_all(text, '{bpe_sql_pat}'),
      t -> trim(t) <> ''))::BIGINT AS n_bpe
FROM documents WHERE doc_id < 50 ORDER BY doc_id
"""
    o["token_count_ws"] = (
        "SELECT doc_id, len(list_filter(string_split(trim(text), ' '), "
        "x -> x <> ''))::BIGINT AS n_ws FROM documents WHERE doc_id < 50"
    )
    def _bm25f_sql(field_filter: str | None = None) -> str:
        tf_where = f"AND field = '{field_filter}'" if field_filter else ""
        return f"""
WITH toks2 AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS term, 'text' AS field
  FROM documents
  UNION ALL
  SELECT doc_id, source AS term, 'source' AS field FROM documents),
{_QUANT_CTE},
dl2 AS (
  SELECT doc_id, 'text' AS field,
         len(list_filter(string_split(text, ' '), x -> x <> '')) AS dl_raw
  FROM documents
  UNION ALL
  SELECT doc_id, 'source' AS field, 1 AS dl_raw FROM documents),
dlq2 AS (SELECT doc_id, field, dl_q FROM dl2 JOIN quant
         ON dl_raw BETWEEN dl_lo AND dl_hi),
stats AS (SELECT (SELECT count(*) FROM documents)::DOUBLE AS n,
                 (SELECT sum(dl_q) FROM dlq2)
                   / (SELECT count(*) FROM documents)::DOUBLE AS avgdl),
dft AS (SELECT term, count(DISTINCT doc_id)::DOUBLE AS df FROM toks2
        WHERE term IN ('fast','src3') GROUP BY 1),
tf2 AS (SELECT doc_id, field, term, count(*)::DOUBLE AS tf FROM toks2
        WHERE term IN ('fast','src3') {tf_where} GROUP BY 1, 2, 3),
scored AS (
  SELECT tf2.doc_id,
         sum( (CASE WHEN tf2.field = 'text' THEN 1.0 ELSE 2.0 END)
              * ln((s.n - dft.df + 0.5) / (dft.df + 0.5) + 1.0)
              * (tf2.tf * {_K1} / (tf2.tf + {_KK} * ({_B1} + {_BB} * d.dl_q / s.avgdl))) ) AS score
  FROM tf2 JOIN dft USING (term)
  JOIN dlq2 d ON d.doc_id = tf2.doc_id AND d.field = tf2.field
  CROSS JOIN stats s
  GROUP BY tf2.doc_id)
SELECT doc_id AS docid, round(score, 4) AS score FROM scored
ORDER BY round(score, 4) DESC, doc_id ASC LIMIT 10
"""

    o["bm25f_two_fields"] = _bm25f_sql()
    o["bm25f_field_filter"] = _bm25f_sql("source")
    o["highlight_kwic"] = f"""
WITH top AS ({_bm25_sql(["fast", "table"], "intersection", top_k=5)})
SELECT d.doc_id,
       CASE WHEN regexp_matches(d.text, '\\bfast\\b') THEN
         regexp_replace(
           substring(d.text,
                     greatest(length(regexp_extract(d.text,
                                     '^(.*?)\\bfast\\b', 1)) + 1 - 30, 1),
                     {2 * 30 + len("fast")}),
           '\\bfast\\b', '<b>fast</b>', 'g')
       ELSE '' END AS kwic
FROM top t JOIN documents d ON d.doc_id = t.docid
"""
    _PHR_PAT = r"\bfast\s+table\b"
    o["highlight_kwic_phrase"] = f"""
WITH top AS ({_bm25_sql(["fast", "table"], "intersection",
                        phrase=["fast", "table"], top_k=5)})
SELECT d.doc_id,
       CASE WHEN regexp_matches(d.text, '{_PHR_PAT}') THEN
         regexp_replace(
           substring(d.text,
                     greatest(length(regexp_extract(d.text,
                                     '^(.*?){_PHR_PAT}', 1)) + 1 - 30, 1),
                     {2 * 30} + length(regexp_extract(d.text,
                                       '{_PHR_PAT}', 0))),
           '{_PHR_PAT}', '<b>\\0</b>', 'g')
       ELSE '' END AS kwic
FROM top t JOIN documents d ON d.doc_id = t.docid
"""
    o["hybrid_rrf"] = f"""
WITH lex AS ({_bm25_sql(["fast", "table"], "union", top_k=10)}),
lexr AS (SELECT docid, row_number() OVER (ORDER BY score DESC, docid ASC)
           AS lex_rank FROM lex),
vec AS (
  WITH q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = 0)
  SELECT e.vec_id AS docid,
         round(
           list_sum(list_transform(range(1, len(e.embedding) + 1),
             i -> e.embedding[i]::DOUBLE * q.qv[i]::DOUBLE))
           / (sqrt(list_sum(list_transform(e.embedding, x -> x::DOUBLE * x::DOUBLE)))
              * sqrt(list_sum(list_transform(q.qv, x -> x::DOUBLE * x::DOUBLE)))),
         4) AS cos_sim
  FROM embeddings e CROSS JOIN q WHERE e.vec_id <> 0
  ORDER BY cos_sim DESC, docid ASC LIMIT 10),
vecr AS (SELECT docid, row_number() OVER (ORDER BY cos_sim DESC, docid ASC)
           AS vec_rank FROM vec)
SELECT COALESCE(l.docid, v.docid) AS docid,
       round(COALESCE(1.0 / (0.6 + l.lex_rank), 0.0)
             + COALESCE(1.0 / (0.6 + v.vec_rank), 0.0), 6) AS rrf_score
FROM lexr l FULL OUTER JOIN vecr v ON l.docid = v.docid
ORDER BY rrf_score DESC, docid ASC LIMIT 10
"""
    o["agg_pricing_summary"] = """
SELECT l_returnflag, l_linestatus,
       round(sum(l_quantity), 2) AS sum_qty,
       round(sum(l_extendedprice), 2) AS sum_price,
       round(avg(l_discount), 6) AS avg_disc,
       count(*)::BIGINT AS n
FROM lineitem GROUP BY l_returnflag, l_linestatus
"""
    o["agg_top_customers"] = """
SELECT c.c_custkey, c.c_name, round(sum(o.o_totalprice), 2) AS revenue
FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
GROUP BY c.c_custkey, c.c_name
ORDER BY revenue DESC, c.c_custkey ASC LIMIT 10
"""
    o["agg_events_daily"] = """
SELECT event_type, ts::DATE AS day, count(*)::BIGINT AS n,
       round(avg(value), 6) AS avg_value
FROM events GROUP BY 1, 2
"""
    return o
