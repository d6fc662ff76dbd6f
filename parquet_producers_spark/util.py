"""Small engine utilities.

ThrottledLogger — rate-limited progress logging, the reference's
``Util/ThrottledLogger.cs:6-31`` (wraps a logger and drops messages
arriving within ``interval`` of the last emitted one). Used by the DAG
pipeline for per-stage progress so a 10k-stage transaction doesn't
flood the driver log; detailed metrics still land in the slice/txn
manifests regardless of throttling.
"""

from __future__ import annotations

import logging
import time


class ThrottledLogger:
    """Emit at most one message per ``interval_s``; later messages
    within the window are dropped (same policy as the reference: the
    FIRST message after the window opens wins, not the last)."""

    def __init__(self, logger: logging.Logger | None = None,
                 interval_s: float = 5.0):
        self._logger = logger or logging.getLogger("parquet_producers_spark")
        self._interval = interval_s
        self._last = float("-inf")
        self.dropped = 0

    def log(self, level: int, msg: str, *args) -> None:
        now = time.monotonic()
        if now - self._last >= self._interval:
            self._last = now
            self._logger.log(level, msg, *args)
        else:
            self.dropped += 1

    def info(self, msg: str, *args) -> None:
        self.log(logging.INFO, msg, *args)
