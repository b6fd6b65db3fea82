"""MongoDB serving sink (the declared "Structured Streaming + MongoDB sink"
deployment shape) — import-gated: pymongo is not in this environment, so the
writer takes any client factory with the pymongo surface and tests inject a
fake.

Reference semantics reproduced exactly (SURVEY.md §1.2 keys):
- upsert-by-unique-key per collection
  (`find_one_and_update(filter, {"$set": doc}, upsert=True)`,
  /root/reference/indexer/scan_raw_txs.py:51-54)
- update-only mode (upsert=False, fastbtcbridge.py:69-78)

Usage under Structured Streaming:

    query = (df.writeStream
        .foreachBatch(MongoUpsertWriter(uri, "db", "Transaction",
                      keys=["transactionHash", "address", "event"]))
        .start())

Each micro-batch partition opens one client and bulk-writes ReplaceOne/
UpdateOne ops — connector-style, no driver-side collect. Idempotent keys
make at-least-once delivery effectively-once (§4 table).
"""

from __future__ import annotations

from typing import Callable

from pyspark.sql import DataFrame


def _default_client_factory(uri: str):
    try:
        import pymongo  # type: ignore
    except ImportError as e:  # pragma: no cover - environment without pymongo
        raise ImportError(
            "pymongo is not installed; pass client_factory= explicitly "
            "(any object with [db][coll].bulk_write / update_one)"
        ) from e
    return pymongo.MongoClient(uri)


class MongoUpsertWriter:
    """foreachBatch callable: MERGE a micro-batch into a Mongo collection."""

    def __init__(
        self,
        uri: str,
        database: str,
        collection: str,
        keys: list[str],
        insert: bool = True,
        client_factory: Callable | None = None,
    ):
        self.uri = uri
        self.database = database
        self.collection = collection
        self.keys = keys
        self.insert = insert
        self.client_factory = client_factory or _default_client_factory

    def __call__(self, batch_df: DataFrame, batch_id: int) -> None:
        keys, insert = self.keys, self.insert
        uri, db, coll_name = self.uri, self.database, self.collection
        factory = self.client_factory

        def write_partition(rows):
            client = factory(uri)
            try:
                coll = client[db][coll_name]
                ops = []
                for row in rows:
                    doc = row.asDict(recursive=True)
                    flt = {k: doc[k] for k in keys}
                    ops.append((flt, doc))
                    if len(ops) >= 500:
                        _flush(coll, ops, insert)
                        ops = []
                if ops:
                    _flush(coll, ops, insert)
            finally:
                # a mid-partition write failure must not leak the client
                close = getattr(client, "close", None)
                if close:
                    close()

        batch_df.rdd.foreachPartition(write_partition)


def _flush(coll, ops, insert: bool) -> None:
    """One network round trip per 500-op buffer — bulk_write of UpdateOne
    ops, the reason the buffering exists (a per-doc update_one loop is one
    round trip per DOCUMENT: ~500x the latency on any real network).
    Falls back to the update_one loop only when the injected client has no
    bulk_write surface (minimal fakes) or pymongo's op classes are absent
    (this container)."""
    bulk = getattr(coll, "bulk_write", None)
    if bulk is not None:
        try:
            from pymongo import UpdateOne  # type: ignore
        except ImportError:
            UpdateOne = None  # type: ignore[assignment]
        if UpdateOne is not None:
            bulk(
                [UpdateOne(flt, {"$set": doc}, upsert=insert)
                 for flt, doc in ops],
                ordered=False,
            )
            return
    for flt, doc in ops:
        coll.update_one(flt, {"$set": doc}, upsert=insert)
