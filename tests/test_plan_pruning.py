"""Physical-plan gates for the query path: the postings scan must
prune to the query terms' tbucket partitions and push the term filter
down to parquet — the properties that make query cost scale with
query-term df instead of corpus size at 100 TB."""

from __future__ import annotations

import io
import re
from contextlib import redirect_stdout

import pytest

from seekstorm_spark.index.builder import IndexBuilder, assign_docids
from seekstorm_spark.query.engine import search
from seekstorm_spark.sources.webtext import synth_webtext


@pytest.fixture(scope="module")
def store(spark, tmp_path_factory):
    docs = assign_docids(synth_webtext(spark, 400, seed=31), order_col="url")
    return IndexBuilder(
        spark, str(tmp_path_factory.mktemp("pp") / "idx"), n_buckets=8
    ).build(docs, text_col="text", id_col="docid")


def _plan_text(df) -> str:
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain(True)
    return buf.getvalue()


def test_postings_scan_prunes_partitions_and_pushes_term_filter(
    spark, store
):
    out = search(
        spark, store, "term00000 term00004", top_k=10,
        default_type="intersection",
    )
    plan = _plan_text(out)
    # tbucket isin(...) must reach PartitionFilters (directory pruning)
    m = re.search(r"PartitionFilters: \[[^\]]*tbucket", plan)
    assert m, "tbucket filter did not reach partition pruning"
    # the term filter must be pushed into the parquet scan
    assert re.search(r"PushedFilters: \[[^\]]*[Tt]erm", plan), (
        "term filter not pushed to the scan"
    )


def test_single_term_fast_path_has_no_window_exchange(spark, store):
    """Single-term, single-field queries skip the per-block window —
    the plan must not contain a window operator (its exchange is the
    one avoidable shuffle on the point-query hot path)."""
    out = search(spark, store, "term00042", top_k=10)
    plan = _plan_text(out)
    assert "Window" not in plan
