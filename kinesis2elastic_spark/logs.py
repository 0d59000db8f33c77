"""Structured request-scoped logging (SURVEY §2 A33).

The reference builds a leveled JSON logger and binds a request-scoped child
carrying the Firehose request id into every handler (main.go:151-197;
log/log.go:46-85) so one request's lines are greppable end to end.  Engine
equivalent: :class:`StructuredLogger` with ``bind()`` — the receiver binds
``requestId`` per POST, the service binds ``epoch`` per micro-batch, the
sink summary logs per-chunk outcomes.

Scope note: this is a *driver-side* concern.  Executor-side code paths
(pandas UDFs, ``foreachPartition``) log through Spark's own log4j and are
correlated by task/stage ids in the Spark UI; the engine-level events that
need request correlation (HTTP accept/reject, batch lifecycle, bulk-chunk
results) all happen on the driver, where this logger lives.  The sink is
injectable, so production can point it at any line-oriented collector.
"""

from __future__ import annotations

import json
import sys
import time
from collections.abc import Callable

LEVELS = {"debug": 10, "info": 20, "warn": 30, "error": 40}


def _stderr_sink(line: str) -> None:
    print(line, file=sys.stderr)


class StructuredLogger:
    """Leveled JSON-lines logger with bound (request-scoped) fields."""

    def __init__(
        self,
        component: str,
        level: str = "info",
        sink: Callable[[str], None] | None = None,
        clock: Callable[[], float] = time.time,
        **fields,
    ):
        if level not in LEVELS:
            raise ValueError(f"unknown level {level!r} (use {sorted(LEVELS)})")
        self.component = component
        self.level = level
        self._sink = sink or _stderr_sink
        self._clock = clock
        self._fields = dict(fields)

    def bind(self, **fields) -> "StructuredLogger":
        """Child logger with extra bound fields (e.g. requestId) — the
        reference's per-request logger derivation (main.go:151-197)."""
        merged = {**self._fields, **fields}
        return StructuredLogger(
            self.component, self.level, self._sink, self._clock, **merged
        )

    def _log(self, level: str, event: str, **fields) -> None:
        if LEVELS[level] < LEVELS[self.level]:
            return
        rec = {
            "ts": round(self._clock(), 3),
            "level": level,
            "component": self.component,
            "event": event,
            **self._fields,
            **fields,
        }
        self._sink(json.dumps(rec, default=str))

    def debug(self, event: str, **fields) -> None:
        self._log("debug", event, **fields)

    def info(self, event: str, **fields) -> None:
        self._log("info", event, **fields)

    def warn(self, event: str, **fields) -> None:
        self._log("warn", event, **fields)

    def error(self, event: str, **fields) -> None:
        self._log("error", event, **fields)
