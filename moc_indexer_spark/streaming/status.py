"""Transaction-status state machine (T2/T3/T4) as keyed streaming state.

Reference: /root/reference/indexer/scan_transaction_status.py
- :34-46  pending -> confirming(percent) -> confirmed maturation
- :48-119 receipt polling: Confirmed/Reverted transitions
- :121-139 stale timeout: no receipt and created_at+600s < chain time
           -> status=failed, errorCode=staleTransaction

Spark-first: `applyInPandasWithState` keyed by tx_hash. Each micro-batch
delivers receipt observations; state carries (created_at, best-known
status); processing-time timeout emits the stale-failure record when a key
goes silent past the deadline — replacing the reference's polling sweep.

The transition function is pure and shared by the batch replay test
(`transition`) and the streaming wrapper, keeping batch/stream parity.
"""

from __future__ import annotations

import datetime as dt
from typing import Iterator

import pandas as pd

from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

CONFIRM_BLOCKS = 10
STALE_SECONDS = 600  # settings seconds_not_in_chain_error

STATE_SCHEMA = (
    "created_at timestamp, status string, confirmations bigint, "
    "error_code string"
)
OUTPUT_SCHEMA = (
    "tx_hash string, status string, confirmations bigint, "
    "confirming_percent bigint, error_code string, last_observed_at timestamp"
)


def transition(
    prev_status: str | None,
    receipt_status: str | None,
    confirmations: int,
    created_at: dt.datetime,
    chain_time: dt.datetime,
    prev_error: str | None = None,
) -> tuple[str, str | None]:
    """One observation -> (status, error_code). Pure reference semantics.

    Terminal states carry their error_code FORWARD: the reference keeps
    errorCode on the failed record (scan_transaction_status.py:121-139),
    so a later observation of a failed tx must re-emit the original code,
    not reset it to NULL (a keyed downstream sink would overwrite the
    stored code)."""
    if prev_status in ("confirmed", "failed"):
        return prev_status, prev_error  # terminal — code persists
    if receipt_status == "reverted":
        return "failed", "reverted"
    if receipt_status == "confirmed":
        return ("confirmed" if confirmations >= CONFIRM_BLOCKS else "confirming"), None
    # no receipt yet
    if created_at + dt.timedelta(seconds=STALE_SECONDS) < chain_time:
        return "failed", "staleTransaction"
    return "pending", None


def confirming_percent(confirmations: int) -> int:
    return min(100, confirmations * (100 // CONFIRM_BLOCKS))


def make_status_func(use_processing_timeout: bool = False):
    """Build the applyInPandasWithState update function, keyed by tx_hash.

    Input rows: (tx_hash, observed_at, receipt_status nullable,
    confirmations, created_at). Emits the post-transition row per batch.

    T4 stale detection is primarily CHAIN-time (the reference compares
    created_at+600s against the chain tip timestamp,
    scan_transaction_status.py:126) — handled inside `transition` and fully
    deterministic. The wall-clock ProcessingTimeTimeout variant is opt-in:
    it additionally fails keys whose observations stop arriving entirely,
    but keeps an availableNow drain from terminating (Spark keeps scheduling
    batches while timeouts are armed), so it suits only long-running mode.
    """

    def status_func(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        (tx_hash,) = key
        timed_out, confs = _handle_timeout(state)
        if timed_out:
            yield _stale_row(tx_hash, confs)
            return
        yield from _handle_rows(tx_hash, pdfs, state, use_processing_timeout)

    return status_func


def _stale_row(tx_hash: str, confs: int = 0) -> pd.DataFrame:
    # confirmations carry the state's last-known count, not a hardcoded 0
    return pd.DataFrame(
        {
            "tx_hash": [tx_hash],
            "status": ["failed"],
            "confirmations": [confs],
            "confirming_percent": [confirming_percent(confs)],
            "error_code": ["staleTransaction"],
            "last_observed_at": [pd.NaT],
        }
    )


def _unpack_state(tup) -> tuple:
    """(created_at, status, confs[, error_code]) -> always a 4-tuple.

    STATE_SCHEMA grew a 4th field (error_code) in round 5; a stream
    restarted from a pre-upgrade applyInPandasWithState /
    transformWithState checkpoint still holds 3-field state tuples. Pad
    the missing code to None instead of failing the unpack — a terminal
    row written before the upgrade re-emits NULL until its next
    observation (the pre-upgrade behavior) rather than crashing inside
    the handler.

    Honesty note on reach: with the DEFAULT
    spark.sql.streaming.stateStore.stateSchemaCheck=true, Spark itself
    rejects the restarted query at startup before any state.get runs —
    the supported migration for a pre-upgrade checkpoint is a NEW
    checkpoint dir (documented here as the schema-change contract). The
    defensive unpack covers deployments running with the schema check
    disabled, and any state handed over via TWS initial-state import."""
    created_at, prev, confs, *rest = tup
    return created_at, prev, confs, (rest[0] if rest else None)


def _handle_timeout(state: GroupState) -> tuple[bool, int]:
    if not state.hasTimedOut:
        return False, 0
    created_at, prev, confs, _err = _unpack_state(state.get)
    if prev not in ("confirmed", "failed"):
        state.update((created_at, "failed", confs, "staleTransaction"))
    return True, confs


def _handle_rows(
    tx_hash: str,
    pdfs: Iterator[pd.DataFrame],
    state: GroupState,
    use_processing_timeout: bool,
) -> Iterator[pd.DataFrame]:
    prev_status = None
    created_at = None
    confs = 0
    err = None
    if state.exists:
        created_at, prev_status, confs, err = _unpack_state(state.get)

    rows = pd.concat(list(pdfs)).sort_values("observed_at")
    last_observed = rows["observed_at"].max()
    for r in rows.itertuples(index=False):
        created_at = created_at or r.created_at
        if prev_status not in ("confirmed", "failed"):
            # a terminal tx keeps its recorded confirmation count — a
            # late observation must not regress it
            confs = int(r.confirmations)
        prev_status, err = transition(
            prev_status, r.receipt_status, int(r.confirmations),
            r.created_at, r.observed_at, prev_error=err,
        )
    state.update((created_at, prev_status, confs, err))
    if use_processing_timeout and prev_status not in ("confirmed", "failed"):
        state.setTimeoutDuration(STALE_SECONDS * 1000)
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


def apply_status_machine(observations_stream, use_processing_timeout: bool = False):
    """Wire the state machine onto a stream of receipt observations."""
    from .windows import ensure_event_time

    observations_stream = ensure_event_time(
        observations_stream, "observed_at", "created_at"
    )
    return observations_stream.groupBy("tx_hash").applyInPandasWithState(
        make_status_func(use_processing_timeout),
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf=(
            GroupStateTimeout.ProcessingTimeTimeout
            if use_processing_timeout
            else GroupStateTimeout.NoTimeout
        ),
    )


def replay_batch(observations: pd.DataFrame) -> pd.DataFrame:
    """Deterministic batch replay of the same transitions (test oracle):
    feed all observations per tx in observed_at order through `transition`,
    including the stale check at each step."""
    out = []
    for tx_hash, grp in observations.sort_values("observed_at").groupby("tx_hash"):
        status, err, confs, created = None, None, 0, None
        for r in grp.itertuples(index=False):
            created = created or r.created_at
            if status not in ("confirmed", "failed"):
                confs = int(r.confirmations)
            status, err = transition(
                status, r.receipt_status, int(r.confirmations),
                r.created_at, r.observed_at, prev_error=err,
            )
        out.append(
            {
                "tx_hash": tx_hash,
                "status": status,
                "confirmations": confs,
                "confirming_percent": confirming_percent(confs),
                "error_code": err if status == "failed" else None,
            }
        )
    return pd.DataFrame(out)
