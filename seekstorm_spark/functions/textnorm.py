"""Unicode text normalization for web-crawl training pipelines.

Standard pre-tokenization cleanup (the step CCNet/C4-style pipelines
run before language ID and dedup): Unicode NFC composition, newline
unification, control-character and zero-width/invisible stripping,
horizontal-whitespace collapse, and paragraph-preserving blank-line
squeezing. The reference engine normalizes at tokenize time
(`/root/reference/seekstorm/src/tokenizer.rs:27-117` folds diacritics
— our `tokenizer.fold_text` twin); THIS op is the corpus-level
normalization a 100-TB ingest runs once so every downstream stage
(dedup hashes, quality filters, token counts) sees canonical bytes.

Parity contract: every regex lives in the Python-`re` ∩ RE2 common
syntax and the pipeline is mirrored step-for-step in DuckDB
(``nfc_normalize`` + ``regexp_replace(..., 'g')``), so the driver
oracle checks byte equality. Python's ``unicodedata`` and DuckDB's
utf8proc implement the same (stable) NFC algorithm.

Scale shape: a stateless Arrow-batched map — no shuffle, no driver
data; ``unicodedata.normalize`` is C-speed per batch.
"""

from __future__ import annotations

import re
import unicodedata

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql.types import StringType

# C0 controls except \t \n, DEL, C1 controls, zero-widths (ZWSP ZWNJ
# ZWJ), word-joiner, soft hyphen, BOM/ZWNBSP — the invisible
# characters crawled HTML actually contains
_STRIP_RE = re.compile(
    "[\x00-\x08\x0b\x0c\x0e-\x1f\x7f-\x9f"
    "\u200b-\u200d\u2060\u00ad\ufeff]"
)
_HWS_RE = re.compile(r"[ \t]+")
_NL3_RE = re.compile(r"\n{3,}")

# the same five steps as SQL fragments (templated on a column
# expression) — kept adjacent to the Python so neither drifts alone
SQL_STEPS = (
    "trim(regexp_replace(regexp_replace(regexp_replace("
    "replace(replace(nfc_normalize({col}), chr(13) || chr(10), chr(10)),"
    " chr(13), chr(10)),"
    " '[\\x00-\\x08\\x0B\\x0C\\x0E-\\x1F\\x7F-\\x9F"
    "\\x{{200B}}-\\x{{200D}}\\x{{2060}}\\x{{00AD}}\\x{{FEFF}}]', '', 'g'),"
    " '[ \\t]+', ' ', 'g'),"
    " '\\n{{3,}}', chr(10) || chr(10), 'g'),"
    " ' ' || chr(9) || chr(10))"
)


def normalize_text_py(text: str | None, form: str = "NFC") -> str | None:
    """Driver-side twin of the UDF (used by tests and oracles)."""
    if text is None:
        return None
    t = unicodedata.normalize(form, text)
    t = t.replace("\r\n", "\n").replace("\r", "\n")
    t = _STRIP_RE.sub("", t)
    t = _HWS_RE.sub(" ", t)
    t = _NL3_RE.sub("\n\n", t)
    return t.strip(" \t\n")


def normalize_text(col: Column | str, form: str = "NFC") -> Column:
    """``col`` normalized: NFC (or NFKC/NFD/NFKD) → newline
    unification (\\r\\n, \\r → \\n) → strip controls/invisibles →
    collapse runs of spaces/tabs to one space → squeeze 3+ blank
    lines to one blank line → trim. Arrow-batched."""
    from pyspark.sql.functions import pandas_udf

    if form not in ("NFC", "NFKC", "NFD", "NFKD"):
        raise ValueError(f"unknown normalization form {form!r}")

    @pandas_udf(StringType())
    def _norm(texts: pd.Series) -> pd.Series:
        return texts.map(lambda t: normalize_text_py(t, form))

    return _norm(F.col(col) if isinstance(col, str) else col)


def normalize_sql(col_expr: str) -> str:
    """The DuckDB mirror of :func:`normalize_text` (form=NFC) applied
    to ``col_expr`` — used verbatim by the driver oracle."""
    return SQL_STEPS.format(col=col_expr)
