"""Deterministic corpus sampling + sequence packing (training mixtures).

Two ops every training-data pipeline needs downstream of cleaning:

* **hash sampling** — reproducible Bernoulli by CONTENT KEY, not by
  partition randomness: ``keep ⇔ md5-prefix(seed|key) < rate·2⁶⁰``.
  Unlike ``DataFrame.sample`` this is stable across retries, partition
  counts, AQE re-plans and engines (the DuckDB oracle computes the
  identical decision), and composable per stratum (language/source
  mixture weights). Pure JVM expressions, one narrow filter, pushes
  down past shuffles.

* **sequence packing** — GPT-style concat-then-chunk: documents are
  concatenated in a deterministic order inside each group and chopped
  into fixed token windows; each doc reports the window (``pack_id``)
  and ``pack_offset`` where its first token lands. One window function
  per group — groups (source/shard) are the parallelism unit, so no
  global single-partition sort at 100 TB.

Reference context: SeekStorm has no sampling surface (it indexes the
full corpus); these are beyond-reference pipeline ops, same tier as
`dedup.py` / `c4.py`.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

# 15 hex chars = 60 bits: fits int64 on both engines (DuckDB casts the
# 0x-literal through UBIGINT; Spark conv(hex,16,10) → string → long)
SAMPLE_HASH_BITS = 60


def sample_hash(key: Column | str, seed: int = 42) -> Column:
    """60-bit engine-agnostic hash of ``seed|key`` — uniform on
    [0, 2⁶⁰); compare against ``int(rate * 2**60)`` to keep."""
    c = F.col(key) if isinstance(key, str) else key
    hx = F.substring(
        F.md5(F.concat_ws("|", F.lit(str(seed)), c.cast("string"))), 1, 15
    )
    return F.conv(hx, 16, 10).cast("long")


def hash_sample(
    df: DataFrame, rate: float, key_col: str = "doc_id", seed: int = 42
) -> DataFrame:
    """Deterministic Bernoulli sample: keeps a row iff its content-key
    hash falls below ``rate``. Same key + seed ⇒ same decision, on any
    cluster, forever."""
    thr = int(rate * (1 << SAMPLE_HASH_BITS))
    return df.filter(sample_hash(key_col, seed) < F.lit(thr))


def stratified_sample(
    df: DataFrame,
    rates: dict[str, float],
    strata_col: str = "lang",
    key_col: str = "doc_id",
    seed: int = 42,
) -> DataFrame:
    """Per-stratum deterministic sampling — the mixture-weights op
    (e.g. upweight low-resource languages by keeping 100% of them and
    1% of English). Strata missing from ``rates`` are dropped."""
    thr: Column = F.lit(0).cast("long")
    for k, v in rates.items():
        thr = F.when(
            F.col(strata_col) == k, F.lit(int(v * (1 << SAMPLE_HASH_BITS)))
        ).otherwise(thr)
    return df.filter(sample_hash(key_col, seed) < thr)


def pack_sequences(
    df: DataFrame,
    n_tokens_col: str,
    budget: int,
    group_col: str = "source",
    order_col: str = "doc_id",
) -> DataFrame:
    """Concat-then-chunk sequence packing: within each ``group_col``
    partition, documents are laid out in ``order_col`` order and cut
    into windows of ``budget`` tokens. Appends ``pack_id`` (0-based
    window index of the doc's first token, per group) and
    ``pack_offset`` (token offset inside that window). A doc longer
    than the remaining window simply continues into the next one —
    exactly the training-loader behavior this mirrors."""
    w = (
        Window.partitionBy(group_col)
        .orderBy(order_col)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    cum_before = F.coalesce(
        F.sum(F.col(n_tokens_col)).over(w), F.lit(0).cast("long")
    )
    return df.withColumn(
        "pack_id", F.floor(cum_before / budget).cast("long")
    ).withColumn("pack_offset", (cum_before % budget).cast("long"))
