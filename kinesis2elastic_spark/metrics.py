"""Observability (SURVEY §2 A16, A32-A33).

The reference counts successfully-queued documents with an atomic counter
(main.go:136, 562-564) and exposes Prometheus metrics via a gin middleware
(main.go:215-217).  Spark-first equivalents:

- ``with_doc_metrics``: ``DataFrame.observe`` — metrics ride the query
  itself (no second pass over the data) and surface per micro-batch in
  streaming progress / via ``Observation`` in batch;
- ``CollectingListener``: a ``StreamingQueryListener`` capturing per-batch
  row counts and the observed metrics — the hook a Prometheus exporter
  would subscribe to in production.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQueryListener

DOC_METRICS = "doc_metrics"


def with_doc_metrics(df: DataFrame, error_col: str = "error_message") -> DataFrame:
    """Attach success/error counters to the flow (A16): n_docs = rows
    emitted, n_errors = dead-lettered rows, n_ok = indexed documents."""
    err = F.col(f"`{error_col}`") if error_col in df.columns else F.lit(None)
    return df.observe(
        DOC_METRICS,
        F.count(F.lit(1)).alias("n_docs"),
        F.count(err).alias("n_errors"),
        (F.count(F.lit(1)) - F.count(err)).alias("n_ok"),
    )


class CollectingListener(StreamingQueryListener):
    """Captures micro-batch progress (rows + observed metrics) in memory;
    production would push these to a metrics sink instead."""

    def __init__(self):
        self.progress: list[dict] = []

    def onQueryStarted(self, event):
        pass

    def onQueryProgress(self, event):
        p = event.progress
        self.progress.append(
            {
                "batchId": p.batchId,
                "numInputRows": p.numInputRows,
                "observed": dict(p.observedMetrics.get(DOC_METRICS).asDict())
                if p.observedMetrics and DOC_METRICS in p.observedMetrics
                else None,
            }
        )

    def onQueryTerminated(self, event):
        pass

    def onQueryIdle(self, event):
        pass
