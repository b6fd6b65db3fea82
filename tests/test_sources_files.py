"""JSONL/CSV ingestion: schema'd reads, corrupt-record quarantine,
round-trip export."""

import json
import os

from pyspark.sql import functions as F
from pyspark.sql import types as T

from moc_indexer_spark.sources import files as FS
from moc_indexer_spark.tables import table


def _write_lines(path, lines):
    with open(path, "w") as f:
        f.write("\n".join(lines) + "\n")


def test_jsonl_good_and_quarantine(spark, tmp_path):
    p = str(tmp_path / "docs.jsonl")
    good_lines = [
        json.dumps(
            {"doc_id": i, "text": f"doc {i}", "lang": "en",
             "source": "s", "n_chars": 5}
        )
        for i in range(10)
    ]
    bad_lines = ['{"doc_id": 11, "text": truncated', "not json at all"]
    _write_lines(p, good_lines[:5] + bad_lines + good_lines[5:])

    good, bad = FS.read_jsonl(spark, p)
    assert good.count() == 10
    assert good.columns == ["doc_id", "text", "lang", "source", "n_chars"]
    assert sorted(r.raw_line for r in bad.collect()) == sorted(bad_lines)

    rep = FS.ingest_report(good, bad).collect()[0]
    assert (rep.good_rows, rep.bad_rows) == (10, 2)
    assert abs(rep.bad_fraction - round(2 / 12, 6)) < 1e-9


def test_jsonl_type_mismatch_is_quarantined(spark, tmp_path):
    p = str(tmp_path / "docs.jsonl")
    _write_lines(
        p,
        [
            json.dumps({"doc_id": 1, "text": "ok", "lang": "en",
                        "source": "s", "n_chars": 2}),
            json.dumps({"doc_id": "NOT_A_NUMBER", "text": "bad type",
                        "lang": "en", "source": "s", "n_chars": 8}),
        ],
    )
    good, bad = FS.read_jsonl(spark, p)
    assert good.count() == 1
    assert bad.count() == 1


def test_jsonl_roundtrip_preserves_corpus(spark, sf_dir, tmp_path):
    out = str(tmp_path / "export")
    docs = table(spark, sf_dir, "documents")
    FS.write_jsonl(docs, out, n_files=4)
    # gzip part files, more than one (write-side file sizing)
    parts = [f for f in os.listdir(out) if f.startswith("part-")]
    assert len(parts) == 4 and all(f.endswith(".gz") for f in parts)
    good, bad = FS.read_jsonl(spark, out)
    assert bad.count() == 0
    assert good.count() == docs.count()
    chk = F.sum(F.conv(F.md5("text").substr(1, 8), 16, 10).cast("bigint"))
    a = docs.agg(F.sum("n_chars"), chk).collect()[0]
    b = good.agg(F.sum("n_chars"), chk).collect()[0]
    assert a == b


def test_csv_quarantine(spark, tmp_path):
    p = str(tmp_path / "docs.csv")
    schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("n_chars", T.LongType()),
        ]
    )
    _write_lines(
        p,
        ["doc_id,n_chars", "1,10", "2,20", "oops,not_a_number", "3,30"],
    )
    good, bad = FS.read_csv(spark, p, schema)
    assert good.count() == 3
    assert bad.count() == 1
    assert "oops" in bad.collect()[0].raw_line


def test_blank_and_null_lines_are_quarantined(spark, tmp_path):
    import json as _json

    p = str(tmp_path / "docs.jsonl")
    good = _json.dumps({"doc_id": 1, "text": "ok", "lang": "en",
                        "source": "s", "n_chars": 2})
    with open(p, "w") as f:
        f.write(good + "\n\nnull\n   \n")
    g, b = FS.read_jsonl(spark, p)
    assert g.count() == 1
    # blank, 'null', and whitespace-only lines all land in quarantine —
    # nothing is silently dropped
    assert b.count() == 3
    assert g.filter(g.doc_id.isNull()).count() == 0


def test_csv_regex_special_delimiter_header_removed(spark, tmp_path):
    """'|' is regex-special: an unescaped F.split would split every
    character, the canonical form would never equal header_canon, and the
    header would leak into `good` as a data row for all-string schemas."""
    p = str(tmp_path / "pipe.csv")
    schema = T.StructType(
        [
            T.StructField("name", T.StringType()),
            T.StructField("city", T.StringType()),
        ]
    )
    _write_lines(p, ["name|city", '"Name" | CITY', "ada|london", "bob|paris"])
    good, bad = FS.read_csv(spark, p, schema, delimiter="|")
    rows = {(r.name, r.city) for r in good.collect()}
    # both header variants (exact and quoted/spaced/case-variant) removed
    assert rows == {("ada", "london"), ("bob", "paris")}
    assert bad.count() == 0
