"""Concurrent query manager + watchdog (T10/T11).

Reference (/root/reference/indexer/):
- tasks_manager.py:49-125  pebble ThreadPool scheduler: 9 periodic tasks,
  per-task interval, 180 s hard timeout, heartbeat alarm on failure
- scan_utils.py:17-58      liveness watchdog: if the chain tip didn't
  advance between runs, reconnect

Spark-first: one SparkSession runs N concurrent StreamingQuery objects
(Spark's scheduler shares executors across them — the ThreadPool
disappears); a StreamingQueryListener provides the heartbeat/alarm; the
watchdog is a progress-timestamp check over the listener's state, and
"reconnect" becomes query restart.
"""

from __future__ import annotations

import threading
import time
from dataclasses import dataclass, field
from typing import Callable

from pyspark.sql import SparkSession
from pyspark.sql.streaming import StreamingQuery
from pyspark.sql.streaming.listener import StreamingQueryListener


class HeartbeatListener(StreamingQueryListener):
    """Heartbeat metric per query (utils.py:30-54 alarm analog): tracks the
    last progress wall-time and batch id; `stalled()` reports queries whose
    progress stopped — feed to alerting or the watchdog."""

    def __init__(self):
        # keys are str(event.id): listener events carry uuid.UUID ids
        # while StreamingQuery.id is a str — un-normalized, the watchdog's
        # `str(q.id) in stalled()` membership NEVER matched and stall
        # detection was silently dead (only fully-terminated queries ever
        # restarted)
        self.last_progress: dict[str, float] = {}
        self.last_batch: dict[str, int] = {}
        self.errors: dict[str, str] = {}
        self._lock = threading.Lock()

    def onQueryStarted(self, event):
        with self._lock:
            self.last_progress[str(event.id)] = time.time()

    def onQueryProgress(self, event):
        with self._lock:
            self.last_progress[str(event.progress.id)] = time.time()
            self.last_batch[str(event.progress.id)] = event.progress.batchId

    def onQueryIdle(self, event):
        with self._lock:
            self.last_progress[str(event.id)] = time.time()

    def onQueryTerminated(self, event):
        with self._lock:
            # a terminated query must stop aging in the stall report (the
            # dead path owns its restart) and must not leak an entry
            self.last_progress.pop(str(event.id), None)
            if event.exception:
                self.errors[str(event.id)] = str(event.exception)

    def stalled(self, timeout_s: float) -> list[str]:
        now = time.time()
        with self._lock:
            return [qid for qid, t in self.last_progress.items()
                    if now - t > timeout_s]


@dataclass
class ManagedQuery:
    name: str
    start: Callable[[], StreamingQuery]  # restartable factory
    query: StreamingQuery | None = None
    restarts: int = 0
    last_error: str | None = None  # exception text of the last restart


class QueryManager:
    """The tasks_manager analog: start/supervise/restart a set of streaming
    queries in one session. `supervise_once` is the watchdog tick (T10):
    restart anything terminated — with error OR cleanly, matching the
    reference's periodic-task rescheduling (a stopped scan task is
    restarted next tick, tasks_manager.py:49-125; test-pinned) — or
    stalled past `stall_timeout` while still active. Do not register
    one-shot availableNow drains here: under this contract they become
    periodic re-drains (cheap with a checkpoint, but intentional only).
    The error text of an error-termination is kept in
    `listener.errors` until the restart consumes it (alarm analog).
    """

    def __init__(self, spark: SparkSession, stall_timeout_s: float = 180.0):
        self.spark = spark
        self.stall_timeout_s = stall_timeout_s
        self.listener = HeartbeatListener()
        spark.streams.addListener(self.listener)
        self.queries: dict[str, ManagedQuery] = {}

    def register(self, name: str, start: Callable[[], StreamingQuery]) -> None:
        self.queries[name] = ManagedQuery(name, start)

    def start_all(self) -> None:
        for mq in self.queries.values():
            if mq.query is None:
                mq.query = mq.start()

    def supervise_once(self) -> list[str]:
        """One watchdog tick; returns names restarted."""
        restarted = []
        stalled_ids = set(self.listener.stalled(self.stall_timeout_s))
        for mq in self.queries.values():
            q = mq.query
            dead = q is None or (not q.isActive)
            stalled = q is not None and q.isActive and str(q.id) in stalled_ids
            if dead or stalled:
                if q is not None and q.isActive:
                    q.stop()
                if q is not None:
                    # consume the alarm for the query being replaced
                    mq.last_error = self.listener.errors.pop(
                        str(q.id), None
                    )
                mq.query = mq.start()
                mq.restarts += 1
                restarted.append(mq.name)
        return restarted

    def stop_all(self) -> None:
        for mq in self.queries.values():
            if mq.query is not None and mq.query.isActive:
                mq.query.stop()
