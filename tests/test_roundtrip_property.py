"""Randomized round-trip ingestion tests — the reference's own strategy
(rand-generated inputs, decode(encode(x)) == x: reference
src/store/io/mod.rs:135-199, src/store/indexing_buffer.rs:416-434),
applied to the ingest→parquet→read path with hypothesis."""

from __future__ import annotations

import math

import pytest

try:
    from hypothesis import HealthCheck, given, settings
    from hypothesis import strategies as st
except ImportError:  # pragma: no cover
    pytest.skip("hypothesis not installed", allow_module_level=True)

from meerkat_spark.ingest import IngestConfig, ingest_rows
from meerkat_spark.ingest.batch import read_table

_row = st.fixed_dictionaries(
    {
        "k": st.integers(min_value=-(2**31), max_value=2**31 - 1),
        "v": st.floats(
            allow_nan=False, allow_infinity=False, min_value=-1e12, max_value=1e12
        ),
        "s": st.text(
            alphabet=st.characters(codec="utf-8", exclude_categories=("Cs",)),
            max_size=40,
        ),
    }
)


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(rows=st.lists(_row, min_size=1, max_size=40))
def test_ingest_roundtrip_random(spark, tmp_path_factory, rows):
    path = str(tmp_path_factory.mktemp("rt") / "tbl")
    # tag rows so the round-trip can align them (no primary keys in the
    # data model, reference README.md:15)
    tagged = [dict(r, rid=i) for i, r in enumerate(rows)]
    ingest_rows(spark, tagged, IngestConfig(path=path))
    back = {r.rid: r for r in read_table(spark, path).collect()}
    assert len(back) == len(tagged)
    for i, r in enumerate(tagged):
        got = back[i]
        assert got.k == r["k"]
        assert math.isclose(got.v, r["v"], rel_tol=0, abs_tol=0) or got.v == r["v"]
        assert got.s == r["s"]
        assert got._ts is not None and got._dedup is not None


def test_lexer_never_crashes_on_garbage():
    """Property: arbitrary input may be REJECTED (KqlSyntaxError) but
    must never escape as IndexError/ValueError/etc. — the round-7
    trailing-'@' crash class (lexer.py). Deterministic corpus: every
    prefix of real queries + tail-truncated operator soup + all single
    and doubled punctuation."""
    from meerkat_spark.kql.lexer import KqlSyntaxError, tokenize

    seeds = [
        "events | where a == 1 | summarize n=count() by b",
        "print x = strcat('a', \"b\"), y = @'c:\\path', z = 1.5e3",
        "T | extend d = dynamic({'k': [1, 'x', null]}) | mv-expand d",
        "range x from 1 to 10 step 3 | project-away x",
    ]
    probes = set()
    for q in seeds:
        probes.update(q[:i] for i in range(len(q) + 1))
    punct = "@'\"`|(){}[]<>=!~+-*/%.,;: \t\n"
    probes.update(punct)
    probes.update(a + b for a in punct for b in punct)
    for text in probes:
        try:
            tokenize(text)
        except KqlSyntaxError:
            pass  # rejection is fine; any other exception is the bug
