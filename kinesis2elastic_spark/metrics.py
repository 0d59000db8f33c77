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

import threading

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQueryListener

DOC_METRICS = "doc_metrics"


class MetricsRegistry:
    """Minimal Prometheus-style counter registry (A32).

    The reference exposes request metrics via a gin Prometheus middleware
    (main.go:215-217) scraped per deploy/manifest.yaml:132-153.  This is the
    stdlib equivalent: atomic counters plus a text-exposition renderer, so
    the receiver can serve ``GET /metrics`` and the streaming listener can
    publish per-batch document counts to the same scrape surface.
    """

    def __init__(self):
        self._lock = threading.Lock()
        self._counters: dict[tuple[str, tuple], float] = {}
        self._help: dict[str, str] = {}
        # metric kind per name: inc() registers "counter", set() "gauge" —
        # the TYPE line must match the write semantics or scrapers
        # mis-handle resets/rates
        self._kind: dict[str, str] = {}

    def describe(self, name: str, help_text: str) -> None:
        with self._lock:
            self._help[name] = help_text

    def inc(self, name: str, labels: dict | None = None, amount: float = 1) -> None:
        key = (name, tuple(sorted((labels or {}).items())))
        with self._lock:
            self._kind.setdefault(name, "counter")
            self._counters[key] = self._counters.get(key, 0) + amount

    def set(self, name: str, value: float, labels: dict | None = None) -> None:
        key = (name, tuple(sorted((labels or {}).items())))
        with self._lock:
            self._kind[name] = "gauge"
            self._counters[key] = value

    def value(self, name: str, labels: dict | None = None) -> float:
        key = (name, tuple(sorted((labels or {}).items())))
        with self._lock:
            return self._counters.get(key, 0)

    @staticmethod
    def _escape_label(v) -> str:
        """Label-value escaping per exposition format 0.0.4: backslash,
        double-quote and newline must be escaped or the scrape corrupts."""
        return (
            str(v)
            .replace("\\", "\\\\")
            .replace('"', '\\"')
            .replace("\n", "\\n")
        )

    def render(self) -> str:
        """Prometheus text exposition format (version 0.0.4)."""
        with self._lock:
            lines: list[str] = []
            seen_help: set[str] = set()
            for (name, labels), val in sorted(self._counters.items()):
                if name not in seen_help:
                    seen_help.add(name)
                    if name in self._help:
                        lines.append(f"# HELP {name} {self._help[name]}")
                    kind = self._kind.get(name, "counter")
                    lines.append(f"# TYPE {name} {kind}")
                if labels:
                    lbl = ",".join(
                        f'{k}="{self._escape_label(v)}"' for k, v in labels
                    )
                    lines.append(f"{name}{{{lbl}}} {val:g}")
                else:
                    lines.append(f"{name} {val:g}")
            return "\n".join(lines) + "\n"


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
    """Captures micro-batch progress (rows + observed metrics) in memory
    and, when given a :class:`MetricsRegistry`, publishes them to the
    ``/metrics`` scrape surface (A32)."""

    def __init__(self, registry: MetricsRegistry | None = None):
        self.progress: list[dict] = []
        self.registry = registry

    def onQueryStarted(self, event):
        pass

    def onQueryProgress(self, event):
        p = event.progress
        observed = (
            dict(p.observedMetrics.get(DOC_METRICS).asDict())
            if p.observedMetrics and DOC_METRICS in p.observedMetrics
            else None
        )
        self.progress.append(
            {
                "batchId": p.batchId,
                "numInputRows": p.numInputRows,
                "observed": observed,
            }
        )
        if self.registry is not None:
            self.registry.inc("k2e_batches_total")
            self.registry.inc("k2e_input_rows_total", amount=p.numInputRows)
            if observed:
                self.registry.inc("k2e_docs_total", amount=observed.get("n_docs", 0))
                self.registry.inc("k2e_docs_ok_total", amount=observed.get("n_ok", 0))
                self.registry.inc(
                    "k2e_doc_errors_total", amount=observed.get("n_errors", 0)
                )

    def onQueryTerminated(self, event):
        pass

    def onQueryIdle(self, event):
        pass
