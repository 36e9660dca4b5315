"""Hybrid lexical + vector result fusion (Reciprocal Rank Fusion).

Engine analog of the reference's hybrid search
(`/root/reference/seekstorm/src/search.rs:1962-2035`): the lexical
top-k and the vector top-k are fused by RRF with k=0.6 —
``score = Σ 1/(k + rank)`` over the lists a doc appears in, rank
1-based. Expressed as two window-ranked DataFrames + full outer join,
fully Catalyst-side.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

RRF_K = 0.6  # reference search.rs:1967


def rrf_fuse(
    lexical: DataFrame,
    vector: DataFrame,
    id_col: str = "docid",
    lex_score_col: str = "score",
    vec_score_col: str = "cos_sim",
    top_k: int = 10,
    k: float = RRF_K,
) -> DataFrame:
    """Fuse two ranked result DataFrames by RRF → (docid, rrf_score).

    Ranks derive from each list's own score ordering (desc, id asc
    tiebreak); docs missing from a list contribute nothing for it.
    """
    lw = Window.orderBy(F.col(lex_score_col).desc(), F.col(id_col).asc())
    vw = Window.orderBy(F.col(vec_score_col).desc(), F.col(id_col).asc())
    lex = lexical.select(
        F.col(id_col).alias("docid"), F.row_number().over(lw).alias("lex_rank")
    )
    vec = vector.select(
        F.col(id_col).alias("docid"), F.row_number().over(vw).alias("vec_rank")
    )
    fused = (
        lex.join(vec, "docid", "full_outer")
        .withColumn(
            "rrf_score",
            F.round(
                F.coalesce(1.0 / (F.lit(k) + F.col("lex_rank")), F.lit(0.0))
                + F.coalesce(1.0 / (F.lit(k) + F.col("vec_rank")), F.lit(0.0)),
                6,
            ),
        )
        .select("docid", "rrf_score")
        .orderBy(F.col("rrf_score").desc(), F.col("docid").asc())
        .limit(top_k)
    )
    return fused
