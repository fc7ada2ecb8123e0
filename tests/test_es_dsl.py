"""ES Query-DSL → Spark translation (operators/es_dsl.py): clause
coverage, reference-shape requests, and loud failure on unsupported
constructs (never silent match-all)."""

from __future__ import annotations

from datetime import datetime, timezone

import pytest
from pyspark.sql import functions as F

from es_ch_sync_spark.operators.es_dsl import EsDslError, apply_es_dsl


@pytest.fixture(scope="module")
def df(spark):
    rows = [
        ("a", "7", datetime(2024, 1, 10, tzinfo=timezone.utc), "view", 1.0),
        ("b", "7", datetime(2024, 1, 15, tzinfo=timezone.utc), "purchase", None),
        ("c", "8", datetime(2024, 1, 15, tzinfo=timezone.utc), "view", 3.0),
        ("d", "7", datetime(2024, 2, 1, tzinfo=timezone.utc), "view", 4.0),
    ]
    return spark.createDataFrame(
        rows, "es_id string, subject string, ts timestamp, event_type string, value double"
    )


def _ms(*a) -> str:
    return str(int(datetime(*a, tzinfo=timezone.utc).timestamp() * 1000))


def test_reference_get_records_since_shape(df):
    """The exact bool.filter(match, range-unixmilli-strings) +
    should(exists)/msm=1 + includes + sort + size document the reference
    builds (elastic.go:46-80)."""
    req = {
        "query": {
            "bool": {
                "filter": [
                    {"match": {"subject": {"query": "7"}}},
                    {"range": {"ts": {"gte": _ms(2024, 1, 1), "lt": _ms(2024, 2, 1)}}},
                ],
                "should": [{"exists": {"field": "value"}}],
                "minimum_should_match": 1,
            }
        },
        "_source": {"includes": ["es_id", "ts", "value"]},
        "sort": [{"ts": {"order": "desc"}}],
        "size": 10,
    }
    out = apply_es_dsl(df, req)
    assert out.columns == ["es_id", "ts", "value"]
    # subject 7, in range, value non-null: only row 'a'
    assert [r["es_id"] for r in out.collect()] == ["a"]


def test_terms_must_not_and_numeric_range(df):
    req = {
        "query": {
            "bool": {
                "must": [{"terms": {"subject": ["7", "8"]}}],
                "must_not": [{"term": {"event_type": {"value": "purchase"}}}],
                "filter": [{"range": {"value": {"gte": 1, "lte": 3}}}],
            }
        }
    }
    got = {r["es_id"] for r in apply_es_dsl(df, req).collect()}
    assert got == {"a", "c"}


def test_should_without_msm_is_optional_when_filter_present(df):
    """ES semantics: should alongside filter/must with no
    minimum_should_match does not restrict matching."""
    req = {
        "query": {
            "bool": {
                "filter": [{"term": {"subject": "7"}}],
                "should": [{"term": {"event_type": "nope"}}],
            }
        }
    }
    assert apply_es_dsl(df, req).count() == 3


def test_bare_should_is_an_or(df):
    req = {
        "query": {
            "bool": {
                "should": [
                    {"term": {"es_id": "a"}},
                    {"term": {"es_id": "c"}},
                ]
            }
        }
    }
    got = {r["es_id"] for r in apply_es_dsl(df, req).collect()}
    assert got == {"a", "c"}


def test_match_all_and_iso_range(df):
    assert apply_es_dsl(df, {"query": {"match_all": {}}}).count() == 4
    req = {"query": {"range": {"ts": {"gte": "2024-01-15T00:00:00"}}}}
    assert apply_es_dsl(df, req).count() == 3


def test_must_not_plus_should_still_requires_a_should(df):
    """ADVICE r6: ES defaults minimum_should_match=1 whenever no
    must/filter clause exists — must_not alone does NOT demote the
    should list to optional."""
    req = {
        "query": {
            "bool": {
                "must_not": [{"term": {"event_type": "purchase"}}],
                "should": [
                    {"term": {"es_id": "a"}},
                    {"term": {"es_id": "b"}},
                ],
            }
        }
    }
    # b is a purchase (excluded by must_not); c/d match neither should
    got = {r["es_id"] for r in apply_es_dsl(df, req).collect()}
    assert got == {"a"}


def test_exists_on_unknown_field_raises(df):
    """ADVICE r6: exists validates the field like every other clause —
    a typo'd field is a loud EsDslError, not an AnalysisException."""
    with pytest.raises(EsDslError):
        apply_es_dsl(df, {"query": {"exists": {"field": "no_such_col"}}})


def test_unsupported_constructs_raise(df):
    with pytest.raises(EsDslError):
        apply_es_dsl(df, {"query": {"wildcard": {"subject": "7*"}}})
    with pytest.raises(EsDslError):
        apply_es_dsl(df, {"query": {"bool": {"should": [
            {"term": {"subject": "7"}}], "minimum_should_match": 2}}})
    with pytest.raises(EsDslError):
        apply_es_dsl(df, {"query": {"term": {"nonexistent_field": "x"}}})
    with pytest.raises(EsDslError):
        apply_es_dsl(df, {"query": {"bool": {"boost_mode": "sum"}}})
