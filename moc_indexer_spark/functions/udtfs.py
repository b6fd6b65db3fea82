"""Python UDTFs (Spark 4 user-defined table functions) — the 1→N row
fan-out API surface of §2.10, exercised end-to-end.

The engine's production fan-outs are Catalyst explodes or Arrow
`mapInPandas` stages (events demux, doc_chunking); this module certifies
the third lane — a real `@udtf` class registered with
`spark.udtf.register` and invoked via LATERAL — against the SAME DuckDB
oracle as the expression-based `doc_chunking`, so the UDTF execution
path itself is under the cross-engine hash gate. Keep heavy per-row
Python OUT of hot paths (see repetition_stats for when Python inverts
that rule); a UDTF is the right tool when the fan-out logic is genuinely
imperative (stateful per-row generators, recursive descent, library
calls that emit variable-length rows).
"""

from __future__ import annotations

from pyspark.sql.functions import udtf


def make_chunk_udtf(chunk_tokens: int, chunk_step: int):
    """A chunking UDTF with the exact `doc_chunking` semantics:
    overlapping `chunk_tokens`-token windows at a `chunk_step` stride
    (window starts 0, step, 2*step, ... <= n-1; a 0-token doc yields one
    empty chunk, matching the expression form's greatest(n-1, 0))."""

    @udtf(returnType=(
        "chunk_idx bigint, n_chunk_tokens bigint, chunk_text string"
    ))
    class ChunkDoc:
        def eval(self, text: str):
            if text is None:
                # the expression form's split(NULL) -> explode(NULL)
                # emits nothing: a NULL doc drops, it must not crash
                # the UDTF lane (None.split -> AttributeError)
                return
            arr = text.split(" ")
            n = len(arr)
            s = 0
            last = max(n - 1, 0)
            while s <= last:
                window = arr[s:s + chunk_tokens]
                yield s // chunk_step, min(chunk_tokens, n - s), " ".join(
                    window
                )
                s += chunk_step

    return ChunkDoc
