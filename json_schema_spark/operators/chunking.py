"""Document chunking: overlapping windows for LLM context packing —
a training-data-pipeline operator (north_star extension; the reference
has no table operators).

Both modes are pure JVM expressions: the window count is computed per
row, ``explode(sequence(...))`` generates the offsets (a ``Generate``
node — codegen-adjacent, executor-local, NO shuffle and NO Python),
and each chunk is a ``substring`` / ``slice`` projection. At 100 TB
chunking is embarrassingly parallel and output-bounded: a document of
length L yields ceil((L - size) / stride) + 1 rows, each carrying only
its own window — the source text never fans out whole.

Character mode counts Unicode code points (``length``/``substring``
semantics shared by Spark, DuckDB, and the reference's code-point
string model, ``BaseLengthCompiler.java:46-48``); token mode splits on
single spaces so the DuckDB oracle can replay it exactly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

__all__ = ["chunk_documents"]


def chunk_documents(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    size: int = 512,
    stride: int = 384,
    by: str = "chars",
) -> DataFrame:
    """``(id_col, chunk_id, chunk_start, chunk_text)`` — windows of
    ``size`` units starting every ``stride`` units (``stride < size``
    gives overlap). A document shorter than one window yields exactly
    one chunk; the final window is allowed to run short rather than
    re-anchoring to the tail, so every chunk start is a multiple of
    ``stride`` (resumable / deterministic addressing).

    ``by='chars'`` counts code points; ``by='tokens'`` splits on single
    spaces and rejoins, so ``chunk_start`` is a token index.
    """
    if stride <= 0 or size <= 0:
        raise ValueError("size and stride must be positive")
    if by not in ("chars", "tokens"):
        raise ValueError(f"by must be 'chars' or 'tokens', got {by!r}")
    txt = F.coalesce(F.col(text_col), F.lit(""))
    if by == "chars":
        n_units = F.length(txt)
    else:
        toks = F.split(txt, " ")
        n_units = F.size(toks)
    k = F.when(n_units <= size, F.lit(1)).otherwise(
        F.ceil((n_units - size).cast("double") / stride).cast("long") + 1)
    out = df.select(
        F.col(id_col),
        txt.alias("__txt"),
        F.explode(F.sequence(F.lit(0).cast("long"), k - 1)).alias("chunk_id"),
    )
    start = F.col("chunk_id") * stride
    if by == "chars":
        chunk = F.col("__txt").substr((start + 1).cast("int"), F.lit(size))
    else:
        chunk = F.array_join(
            F.slice(F.split(F.col("__txt"), " "), (start + 1).cast("int"), size), " ")
    return out.select(
        id_col,
        "chunk_id",
        start.alias("chunk_start"),
        chunk.alias("chunk_text"),
    )
