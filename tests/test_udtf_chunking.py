

def test_chunk_udtf_null_text_matches_expression_form(spark):
    """A NULL text row: the expression form's split(NULL)->explode emits
    nothing; the UDTF lane must likewise emit nothing instead of crashing
    on None.split."""
    from moc_indexer_spark.functions.udtfs import make_chunk_udtf

    ChunkDoc = make_chunk_udtf(chunk_tokens=4, chunk_step=2)
    spark.udtf.register("chunk_doc_nulltest", ChunkDoc)
    df = spark.createDataFrame(
        [(1, "a b c d e"), (2, None)], "doc_id long, text string"
    )
    df.createOrReplaceTempView("null_docs")
    out = spark.sql(
        "SELECT doc_id, c.* FROM null_docs, "
        "LATERAL chunk_doc_nulltest(text) c"
    ).collect()
    assert {r.doc_id for r in out} == {1}  # the NULL doc drops, no crash
