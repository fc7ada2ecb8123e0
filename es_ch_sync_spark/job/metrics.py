"""Job observability — the Spark-native analog of the reference's
monitoring endpoint (/root/reference/cmd/es-ch-sync/main.go:108-123).

The reference serves the stock Prometheus process handler; it defines no
custom counters.  What an operator of the sync job actually needs is the
pipeline's own numbers: documents scanned, signals emitted, rows
quarantined.  The Spark-first way to get them is the **Observation API**:
named aggregates attached to a DataFrame that the executors accumulate
WHILE the job runs — zero extra passes, unlike calling ``.count()`` on
each side output (which re-executes the pipeline per metric; at 100 TB
that is N full scans).

Usage::

    signals, obs = observe(signals, "sync_out", n_signals=F.count(F.lit(1)),
                           n_tokens_max=F.max("token_id"))
    signals.write.parquet(path)          # the action that populates obs
    print(prometheus_text(obs.get))      # exposition-format scrape body

Serving the text over HTTP is deployment plumbing (sidecar /
PrometheusServlet via `spark.ui.prometheus.enabled`, or the driver's own
metrics sink); this module produces the numbers and the scrape body.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Observation
from pyspark.sql import functions as F


def observe(
    df: DataFrame, name: str, **metrics: Column
) -> tuple[DataFrame, Observation]:
    """Attach named aggregate metrics to ``df``; returns (df, observation).

    Metrics must be aggregates Spark allows in ``observe`` (count / sum /
    min / max / avg — no distinct aggregates): they are merged per-task,
    so they can't require a shuffle of their own."""
    obs = Observation(name)
    observed = df.observe(obs, *[c.alias(alias) for alias, c in metrics.items()])
    return observed, obs


def observe_signals(signals: DataFrame) -> tuple[DataFrame, Observation]:
    """Standard metric set for the tall signal output of plan_sync."""
    return observe(
        signals,
        "signals_out",
        n_signals=F.count(F.lit(1)),
        n_numeric=F.count("value_number"),
        n_string=F.count("value_string"),
        min_ts=F.min("timestamp"),
        max_ts=F.max("timestamp"),
    )


def observe_quarantine(quarantined: DataFrame) -> tuple[DataFrame, Observation]:
    """Metric set for the quarantine side output (T3 — the reference logs
    each dropped document, sync.go:192-204; here the count rides the job)."""
    return observe(quarantined, "quarantine", n_quarantined=F.count(F.lit(1)))


def prometheus_text(
    metrics: dict[str, object], prefix: str = "es_ch_sync_spark"
) -> str:
    """Render a metrics dict as Prometheus exposition text (gauges).

    Non-numeric observation values (e.g. min/max timestamps) are skipped —
    exposition format carries numbers only."""
    lines: list[str] = []
    for key, value in sorted(metrics.items()):
        if isinstance(value, bool) or not isinstance(value, (int, float)):
            continue
        metric = f"{prefix}_{key}"
        lines.append(f"# TYPE {metric} gauge")
        lines.append(f"{metric} {value}")
    return "\n".join(lines) + "\n"
