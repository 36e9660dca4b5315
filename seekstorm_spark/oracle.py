"""Single-node pure-Python reference implementation (test oracle).

Implements the same semantics as the Spark engine — tokenize → stats →
BM25 → query algebra → top-k — in plain dicts, for golden comparison
in pytest. Mirrors the reference engine's query lifecycle
(`/root/reference/seekstorm/src/search.rs:1154-2131`) at miniature
scale. Deliberately simple and obviously-correct; not fast.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np

from seekstorm_spark.quantization import quantize_length
from seekstorm_spark.scoring import bm25_term_scores
from seekstorm_spark.tokenizer import ParsedQuery, parse_query, tokenize_doc


@dataclass
class OracleIndex:
    n_docs: int
    avgdl: float
    # term -> {docid: positions list}
    postings: dict[str, dict[int, list[int]]]
    # docid -> quantized doc length
    dl_q: dict[int, int]


def build_oracle_index(
    docs: dict[int, str],
    tokenizer: str = "unicode_alphanumeric",
    stop_words: frozenset[str] | None = None,
) -> OracleIndex:
    postings: dict[str, dict[int, list[int]]] = {}
    dl_q: dict[int, int] = {}
    dl_sum = 0
    for docid, text in docs.items():
        terms, count = tokenize_doc(text, tokenizer, stop_words)
        q = quantize_length(count)
        dl_q[docid] = q
        dl_sum += q
        for term, positions in terms.items():
            postings.setdefault(term, {})[docid] = positions
    n = len(docs)
    # f32 division as in reference commit.rs:318-319
    avgdl = float(np.float32(dl_sum) / np.float32(n)) if n else 1.0
    return OracleIndex(n_docs=n, avgdl=avgdl, postings=postings, dl_q=dl_q)


def _phrase_match(
    idx: OracleIndex, docid: int, phrase_terms: list[tuple[str, int]]
) -> bool:
    """Position-alignment check (reference add_result.rs:3152-3391):
    pos_i + offset_j == pos_j + offset_i for one shared anchor."""
    lists = []
    for term, offset in phrase_terms:
        plist = idx.postings.get(term, {}).get(docid)
        if plist is None:
            return False
        lists.append((offset, set(plist)))
    base_off, base = lists[0]
    for p in base:
        if all((p - base_off + off) in s for off, s in lists[1:]):
            return True
    return False


def search_oracle(
    idx: OracleIndex,
    query: str,
    top_k: int = 10,
    default_type: str = "union",
    tokenizer: str = "unicode_alphanumeric",
    stop_words: frozenset[str] | None = None,
) -> tuple[list[tuple[int, float]], int]:
    """Returns (top-k [(docid, f32 score)], total match count).

    Ties broken docid-asc (declared engine tiebreak, SURVEY §7.7).
    """
    pq: ParsedQuery = parse_query(query, default_type, tokenizer, stop_words)
    # dedup positive terms, keeping op strength (search.rs:3053-3064)
    seen: dict[str, str] = {}
    phrase_terms: list[tuple[str, int]] = []
    for t in pq.terms:
        if t.op == "not":
            continue
        if t.op == "phrase" and t.phrase_index >= 0:
            phrase_terms.append((t.term, t.phrase_index))
        if t.term not in seen or t.op in ("intersection", "phrase"):
            seen[t.term] = t.op
    not_terms = {t.term for t in pq.terms if t.op == "not"}

    if not seen:
        return [], 0

    qtype = pq.query_type
    term_docs = {term: set(idx.postings.get(term, {})) for term in seen}
    if qtype in ("intersection", "phrase"):
        candidates: set[int] | None = None
        for docs in term_docs.values():
            candidates = docs if candidates is None else candidates & docs
        candidates = candidates or set()
    else:
        candidates = set()
        for docs in term_docs.values():
            candidates |= docs

    for nt in not_terms:
        candidates -= set(idx.postings.get(nt, {}))

    if qtype == "phrase" and len(phrase_terms) > 1:
        candidates = {d for d in candidates if _phrase_match(idx, d, phrase_terms)}

    if not candidates:
        return [], 0

    cand = np.array(sorted(candidates), dtype=np.int64)
    dlq = np.array([idx.dl_q[d] for d in cand], dtype=np.int64)
    scores = np.zeros(len(cand), dtype=np.float32)
    for term in seen:
        plist = idx.postings.get(term, {})
        if not plist:
            continue
        df = len(plist)
        tf = np.array([len(plist.get(int(d), ())) for d in cand], dtype=np.int64)
        mask = tf > 0
        if mask.any():
            contrib = bm25_term_scores(
                tf[mask], dlq[mask], idx.n_docs, df, idx.avgdl, dtype=np.float32
            )
            scores[mask] += contrib
    order = np.lexsort((cand, -scores.astype(np.float64)))
    top = order[:top_k]
    return [(int(cand[i]), float(scores[i])) for i in top], int(len(cand))
