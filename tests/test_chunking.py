"""Chunking operator — window math, short/empty/null docs, token mode,
and the no-shuffle/no-Python plan guarantee. The driver oracle
(``chunk_{chars,tokens}_documents``) pins byte parity with DuckDB."""

import pytest

from json_schema_spark.operators.chunking import chunk_documents


@pytest.fixture()
def docs(spark):
    return spark.createDataFrame(
        [(1, "abcdefghij"), (2, "ab"), (3, ""), (4, None),
         (5, "w1 w2 w3 w4 w5 w6 w7")],
        "doc_id long, text string")


def test_char_windows(docs):
    rows = (chunk_documents(docs, size=4, stride=3, by="chars")
            .where("doc_id = 1").orderBy("chunk_id").collect())
    assert [(r.chunk_id, r.chunk_start, r.chunk_text) for r in rows] == [
        (0, 0, "abcd"), (1, 3, "defg"), (2, 6, "ghij")]


def test_short_empty_null_docs_yield_one_chunk(docs):
    rows = (chunk_documents(docs, size=4, stride=3)
            .where("doc_id in (2, 3, 4)").orderBy("doc_id").collect())
    assert [(r.doc_id, r.chunk_id, r.chunk_text) for r in rows] == [
        (2, 0, "ab"), (3, 0, ""), (4, 0, "")]


def test_token_windows(docs):
    rows = (chunk_documents(docs, size=3, stride=2, by="tokens")
            .where("doc_id = 5").orderBy("chunk_id").collect())
    assert [r.chunk_text for r in rows] == [
        "w1 w2 w3", "w3 w4 w5", "w5 w6 w7"]
    assert [r.chunk_start for r in rows] == [0, 2, 4]


def test_exact_multiple_has_no_empty_tail(spark):
    # len == size → one chunk; len == size + stride → exactly two
    df = spark.createDataFrame([(1, "abcd"), (2, "abcdefg")],
                               "doc_id long, text string")
    rows = (chunk_documents(df, size=4, stride=3).orderBy("doc_id", "chunk_id")
            .collect())
    assert [(r.doc_id, r.chunk_text) for r in rows] == [
        (1, "abcd"), (2, "abcd"), (2, "defg")]


def test_code_point_windows(spark):
    df = spark.createDataFrame([(1, "αβγδε")], "doc_id long, text string")
    rows = chunk_documents(df, size=3, stride=2).orderBy("chunk_id").collect()
    assert [r.chunk_text for r in rows] == ["αβγ", "γδε"]


def test_invalid_args(docs):
    with pytest.raises(ValueError):
        chunk_documents(docs, size=0)
    with pytest.raises(ValueError):
        chunk_documents(docs, by="sentences")


def test_plan_no_shuffle_no_python(docs):
    plan = (chunk_documents(docs, size=4, stride=3)
            ._jdf.queryExecution().executedPlan().toString())
    assert "Exchange" not in plan
    assert "Python" not in plan and "ArrowEval" not in plan
    assert "Generate" in plan
