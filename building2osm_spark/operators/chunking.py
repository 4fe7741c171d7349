"""Document chunking for retrieval / embedding pipelines.

Fixed-size character windows with overlap — the preprocessing step in
front of every embedding or retrieval index build. MAP-ONLY by
construction: one generated start array per document + posexplode; no
shuffle, no Python, so it composes with any downstream embedding stage
without adding an exchange, and throughput scales linearly with input
splits at any cluster size.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def chunk_documents(
    df: DataFrame,
    size: int,
    overlap: int = 0,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Split each document into chunks of ``size`` characters whose
    starts step by ``stride = size - overlap``: chunk i covers
    [i*stride, i*stride + size), every character is covered, and
    consecutive chunks share ``overlap`` characters. The LAST start is
    the smallest stride multiple reaching the end (``ceil((len-size)/
    stride)*stride``, floored at 0) — the final chunk may be shorter
    but is never fully contained in its predecessor. Deterministic and
    purely positional — the chunk set is a function of the text alone
    (partitioning/retry/session invariant), with an exact SQL twin
    (generate_series + substr).

    NULL texts are dropped; an empty text yields no chunks. Returns
    (id_col, chunk_idx, start, chunk) with chunk_idx and start 0-based.
    """
    if size < 1:
        raise ValueError(f"size must be >= 1, got {size}")
    if not 0 <= overlap < size:
        raise ValueError(f"overlap must be in [0, size), got {overlap}")
    if id_col in ("pos", "col") or text_col in ("pos", "col"):
        # posexplode's output names; an input column so named would make
        # the projection ambiguous
        raise ValueError("id_col/text_col must not be named 'pos' or 'col'")
    if id_col in ("chunk_idx", "start", "chunk"):
        # would silently duplicate an output column name
        raise ValueError(
            "id_col must not be named 'chunk_idx', 'start' or 'chunk'"
        )
    stride = size - overlap
    # exact integer ceil-div for the last start (a double ceil() would
    # drift on long texts); sequence() raises on start > stop with a
    # positive step, so the empty-text case must short-circuit
    last = (
        f"greatest((length({text_col}) - {size} + {stride - 1}) div {stride}, 0)"
        f" * {stride}"
    )
    starts = F.when(
        F.length(F.col(text_col)) > 0,
        F.expr(f"sequence(0L, {last}, {stride}L)"),
    ).otherwise(F.array().cast("array<bigint>"))
    return (
        df.filter(F.col(text_col).isNotNull())
        .select(F.col(id_col), F.col(text_col), F.posexplode(starts))
        .select(
            id_col,
            F.col("pos").cast("int").alias("chunk_idx"),
            F.col("col").cast("int").alias("start"),
            F.expr(f"substring({text_col}, col + 1, {size})").alias("chunk"),
        )
    )
