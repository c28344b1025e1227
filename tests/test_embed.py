"""Hashed document embeddings (functions/embed.py): normalization,
dense/sparse agreement, and similarity semantics."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from depositaja_spark.functions import embed as em

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def docs(spark):
    return spark.read.parquet(f"{SF}/documents.parquet").select("doc_id", "text")


def test_cells_are_unit_norm(spark, docs):
    norms = (
        em.hashed_embedding_cells(docs)
        .groupBy("doc_id")
        .agg(F.sum(F.col("value") * F.col("value")).alias("n2"))
        .collect()
    )
    assert norms
    for r in norms:
        assert r.n2 == pytest.approx(1.0, abs=1e-4)  # 6-decimal cell rounding


def test_dense_matches_cells(spark, docs):
    cells = {
        (r.doc_id, r.dim): r.value
        for r in em.hashed_embedding_cells(docs).collect()
    }
    dense = {r.doc_id: r.embedding for r in em.hashed_embeddings(docs).collect()}
    assert set(dense) == {d for d, _ in cells}
    for d, vec in dense.items():
        assert len(vec) == em.EMBED_DIM
        for i, v in enumerate(vec):
            assert v == pytest.approx(cells.get((d, i), 0.0), abs=1e-12)


def test_identical_docs_have_cosine_one(spark):
    docs = spark.createDataFrame(
        [(1, "alpha beta gamma"), (2, "alpha beta gamma"), (3, "delta epsilon zeta")],
        "doc_id long, text string",
    )
    vecs = {r.doc_id: r.embedding for r in em.hashed_embeddings(docs).collect()}

    def cos(a, b):
        return sum(x * y for x, y in zip(a, b)) / (
            math.sqrt(sum(x * x for x in a)) * math.sqrt(sum(y * y for y in b))
        )

    assert cos(vecs[1], vecs[2]) == pytest.approx(1.0, abs=1e-9)
    assert cos(vecs[1], vecs[3]) < 0.99


def test_overlapping_docs_closer_than_disjoint(spark):
    docs = spark.createDataFrame(
        [
            (1, "red green blue yellow purple orange"),
            (2, "red green blue cyan magenta white"),
            (3, "one two three four five six"),
        ],
        "doc_id long, text string",
    )
    vecs = {r.doc_id: r.embedding for r in em.hashed_embeddings(docs).collect()}

    def cos(a, b):
        return sum(x * y for x, y in zip(a, b)) / (
            math.sqrt(sum(x * x for x in a)) * math.sqrt(sum(y * y for y in b))
        )

    assert cos(vecs[1], vecs[2]) > cos(vecs[1], vecs[3])


def test_empty_corpus(spark):
    e = spark.createDataFrame([], "doc_id long, text string")
    assert em.hashed_embedding_cells(e).count() == 0
    assert em.hashed_embeddings(e).count() == 0


def test_single_shuffle_shape(spark, docs):
    """The cell build is explode → ONE (doc, dim) aggregation plus the
    dim-bounded norm join — no corpus self-join, no window."""
    import contextlib
    import io

    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        em.hashed_embedding_cells(docs).explain("formatted")
    p = buf.getvalue()
    assert "CartesianProduct" not in p and "BroadcastNestedLoop" not in p
    assert "WindowExec" not in p and "Window" not in p.split("== Physical Plan ==")[1].split("\n\n")[0]
