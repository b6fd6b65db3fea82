"""Status machine on the Spark 4 `transformWithState` API (T2/T3/T4).

Same semantics as streaming/status.py (both delegate every decision to the
pure `transition` function), expressed on the successor API:

- `applyInPandasWithState` (status.py): function + explicit GroupState —
  the stable Spark 3.x surface.
- `transformWithStateInPandas` (here): a StatefulProcessor with named,
  schema'd state variables, timers, and RocksDB-backed state — where
  Spark's stateful processing is heading; TTL/timers/multiple state vars
  come for free when the pipeline needs them.

Runtime requirements (both environment, not code, concerns):
- RocksDB state-store provider
  (`spark.sql.streaming.stateStore.providerClass = ...RocksDBStateStoreProvider`).
- the `protobuf` Python package — the TWS state protocol speaks protobuf to
  the JVM state server (pyspark/sql/streaming/proto/StateMessage_pb2). This
  container lacks it, so the end-to-end parity test auto-skips here; the
  processor's transition logic is still covered by a direct-drive unit test
  with a fake ValueState (tests/test_streaming.py), and the module runs
  unchanged where protobuf exists.
- the package must be importable by the TWS *driver worker* (a separate
  long-running Python process): it honors PYTHONPATH but NOT
  `sparkContext.addPyFile`, so `session.ship_package()` is not enough for
  this operator on a cluster — ship the package via PYTHONPATH/venv.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd

from pyspark.sql.streaming import StatefulProcessor, StatefulProcessorHandle
from pyspark.sql.types import (
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

from .status import OUTPUT_SCHEMA, _unpack_state, confirming_percent, transition

ROCKSDB_PROVIDER = (
    "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"
)

_STATE_SCHEMA = StructType(
    [
        StructField("created_at", TimestampType()),
        StructField("status", StringType()),
        StructField("confirmations", LongType()),
        StructField("error_code", StringType()),
    ]
)


class StatusProcessor(StatefulProcessor):
    """Keyed tx-status processor: one ValueState row per tx_hash."""

    def init(self, handle: StatefulProcessorHandle) -> None:
        self._state = handle.getValueState("txstate", _STATE_SCHEMA)

    def handleInputRows(
        self, key, rows: Iterator[pd.DataFrame], timerValues
    ) -> Iterator[pd.DataFrame]:
        (tx_hash,) = key
        prev_status, created_at, confs, err = None, None, 0, None
        if self._state.exists():
            # defensive unpack: tolerates 3-field state from a pre-
            # error_code checkpoint (see status._unpack_state)
            created_at, prev_status, confs, err = _unpack_state(
                self._state.get()
            )

        pdf = pd.concat(list(rows)).sort_values("observed_at")
        last_observed = pdf["observed_at"].max()
        for r in pdf.itertuples(index=False):
            created_at = created_at or r.created_at
            if prev_status not in ("confirmed", "failed"):
                confs = int(r.confirmations)
            prev_status, err = transition(
                prev_status, r.receipt_status, int(r.confirmations),
                r.created_at, r.observed_at, prev_error=err,
            )
        self._state.update((created_at, prev_status, confs, err))
        yield pd.DataFrame(
            {
                "tx_hash": [tx_hash],
                "status": [prev_status],
                "confirmations": [confs],
                "confirming_percent": [confirming_percent(confs)],
                "error_code": [err if prev_status == "failed" else None],
                "last_observed_at": [last_observed],
            }
        )

    def close(self) -> None:
        pass


def apply_status_machine_tws(observations_stream):
    """Wire the processor onto the observation stream (RocksDB provider
    must be active in the session conf when the query starts)."""
    return observations_stream.groupBy("tx_hash").transformWithStateInPandas(
        statefulProcessor=StatusProcessor(),
        outputStructType=OUTPUT_SCHEMA,
        outputMode="Append",
        timeMode="None",
    )
