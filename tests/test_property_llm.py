"""Property-based checks (hypothesis) for the LLM-pipeline operators
that have pure-Python reference semantics: excision and packing.

Example counts are small and explicit — every example drives a real
Spark job, so these are breadth tests (weird shapes: empty docs,
all-identical corpora, k longer than any doc, tiny alphabets forcing
dense window collisions), not thousand-case fuzzing. The deterministic
suites in test_excise.py / test_packing.py pin the exact planted
cases."""

from __future__ import annotations

import pytest

hypothesis = pytest.importorskip("hypothesis")
from hypothesis import HealthCheck, given, settings, strategies as st  # noqa: E402

from solana_snapshot_etl_tools_spark.operators import excise as E  # noqa: E402
from solana_snapshot_etl_tools_spark.operators.packing import (  # noqa: E402
    pack_token_sequences,
)
from tests.test_excise import _reference as excise_reference  # noqa: E402
from tests.test_packing import _reference as pack_reference  # noqa: E402

_SETTINGS = settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

# tiny alphabet → dense window collisions; includes the empty doc
_corpora = st.lists(
    st.text(alphabet="abc ", max_size=60),
    min_size=1,
    max_size=6,
)


@_SETTINGS
@given(texts=_corpora, k=st.integers(min_value=2, max_value=12))
def test_excise_always_matches_reference(spark, texts, k):
    rows = list(enumerate(texts))
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        r.doc_id: (r.text_clean, r.n_excised_chars)
        for r in E.excise_dup_spans(df, k=k).collect()
    }
    assert got == excise_reference(rows, k)


@_SETTINGS
@given(
    docs=st.lists(
        st.lists(st.integers(min_value=1, max_value=9), max_size=25),
        min_size=1,
        max_size=6,
    ),
    seq_len=st.integers(min_value=2, max_value=17),
    eos=st.one_of(st.none(), st.just(0)),
)
def test_pack_always_matches_reference(spark, docs, seq_len, eos):
    rows = list(enumerate(docs))
    df = spark.createDataFrame(rows, "doc_id long, token_ids array<int>")
    got = {
        r.seq_id: list(r.input_ids)
        for r in pack_token_sequences(df, seq_len, eos_id=eos).collect()
    }
    assert got == pack_reference(rows, seq_len, eos)
