"""Driver-side expression-construction helpers.

``F.array(*[F.lit(v) for v in vals])`` costs 2 py4j round-trips per
element — ~0.1 s for a 256-entry table, paid on EVERY query that
builds the expression (profiled: the literal-array listcomp was the
single largest slice of WAND plan-construction time). Building the
same literal array as ONE ``F.expr`` string is a single round-trip.

Exactness: ``repr(float(v))`` is the shortest round-trip decimal for
the IEEE double, and Spark parses ``<decimal>D`` with
``Double.parseDouble`` — the identical bit pattern ``F.lit(float(v))``
would have produced.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def double_array_sql(vals) -> str:
    """SQL text for a literal ``array<double>``."""
    return "array(" + ",".join(f"{float(v)!r}D" for v in vals) + ")"


def double_array(vals) -> Column:
    """Literal ``array<double>`` column via one py4j call."""
    return F.expr(double_array_sql(vals))


def long_array(vals) -> Column:
    """Literal ``array<bigint>`` column via one py4j call."""
    return F.expr("array(" + ",".join(f"{int(v)}L" for v in vals) + ")")
