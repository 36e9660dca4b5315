"""PII scrubbing for training-data pipelines — pure JVM regexes.

A 100-TB pre-training corpus is scrubbed of personally identifiable
information before anything else touches it. The reference engine
stops at ingestion (`/root/reference/seekstorm/src/ingest.rs` takes
text as-is), so this is a pipeline-side extension, not a parity
feature: every pattern is a single `regexp_replace` that stays inside
whole-stage codegen — no UDF, no shuffle, scales linearly with input
bytes.

Patterns are deliberately restricted to syntax valid in BOTH Java
regex (Spark) and RE2 (DuckDB) — no backreferences, no lookaround —
so the DuckDB oracle can mirror them verbatim.

Replacement order matters and is fixed: emails first (their digit
runs must not be half-eaten by the phone pattern), then IPv4 (dotted
quads would otherwise feed the phone matcher), then phones.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# (kind, pattern, replacement) — ORDER IS SEMANTIC, see module doc.
PII_PATTERNS: tuple[tuple[str, str, str], ...] = (
    (
        "email",
        r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}",
        "<EMAIL>",
    ),
    (
        "ipv4",
        r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b",
        "<IP>",
    ),
    (
        "phone",
        r"\(?\d{3}\)?[-. ]?\d{3}[-. ]?\d{4}",
        "<PHONE>",
    ),
)


def redact_pii(text: Column) -> Column:
    """Replace emails, IPv4 addresses, and NANP-shaped phone numbers
    with ``<EMAIL>`` / ``<IP>`` / ``<PHONE>`` tokens. One chained
    JVM ``regexp_replace`` per kind — the whole expression compiles
    into the scan's codegen stage."""
    out = text
    for _kind, pat, repl in PII_PATTERNS:
        out = F.regexp_replace(out, pat, repl)
    return out


def _token_count(redacted: Column, token: str) -> Column:
    # occurrences of a fixed literal = length delta / token length
    return (
        (F.length(redacted) - F.length(F.replace(redacted, F.lit(token))))
        / F.lit(len(token))
    ).cast("long")


def pii_features(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Adds ``redacted`` plus per-kind match counts (``n_email``,
    ``n_ipv4``, ``n_phone``). Counts are derived from the redacted
    text (literal-token counting), so they are exact for the
    non-overlapping replacements `regexp_replace` performs."""
    red = redact_pii(F.col(text_col))
    out = df.withColumn("redacted", red)
    for kind, _pat, repl in PII_PATTERNS:
        out = out.withColumn(
            f"n_{kind}", _token_count(F.col("redacted"), repl)
        )
    return out
