"""Connector option-building is real logic (the reference's connection
surface); the jar-gated paths must fail with actionable errors here."""

from __future__ import annotations

import pytest

from es_ch_sync_spark.io.connectors import (
    ConnectorUnavailable,
    ch_jdbc_options,
    es_read_options,
    read_es_status,
)


def test_es_options_encode_reference_surface():
    opts = es_read_options("es.example:9200", "device-status-prod*", username="u", password="p")
    assert opts["es.resource"] == "device-status-prod*"
    assert opts["es.internal.spark.sql.pushdown"] == "true"
    assert opts["es.net.http.auth.user"] == "u"


def test_ch_options_default_url_scheme():
    opts = ch_jdbc_options("ch.example:8123", table="signal")
    assert opts["url"].startswith("jdbc:clickhouse://")
    assert opts["dbtable"] == "signal"
    assert opts["isolationLevel"] == "NONE"


def test_missing_jar_raises_actionable_error(spark):
    with pytest.raises(ConnectorUnavailable, match="--packages org.elasticsearch"):
        read_es_status(spark, "localhost:9200", "idx")
