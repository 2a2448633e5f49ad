"""Document chunking — fixed-size token windows with overlap.

The context-window prep step of a training/RAG pipeline: each
document explodes into chunks of ``size`` tokens advancing by
``step`` (overlap = size - step), with a tail-covering final chunk so
no token is dropped. Entirely array-native Catalyst expressions: one
bound token array per row, one explode — map-only, no shuffle, no
UDF; at 100 TB chunking is pure scan throughput.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.text import chunk_starts


def chunk_documents(
    df: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    size: int = 64,
    step: int = 48,
) -> DataFrame:
    """One row per chunk: (id, chunk_idx, start_token, n_tokens, chunk).

    ``start_token`` is 1-based; ``chunk_idx`` numbers chunks 0..k-1 in
    order. The token array binds as a projected column before the
    explode (the expression-binding rule: an inlined array would be
    recomputed per chunk).
    """
    if step <= 0 or size <= 0 or step > size:
        raise ValueError("need 0 < step <= size")
    toks = F.split(F.trim(F.col(text_col)), " ")
    base = df.select(
        F.col(id_col),
        toks.alias("__toks"),
        chunk_starts(toks, size=size, step=step).alias("__starts"),
    )
    exploded = base.select(
        id_col,
        F.posexplode("__starts").alias("chunk_idx", "start_token"),
        F.col("__toks"),
    )
    piece = F.slice("__toks", F.col("start_token"), size)
    return exploded.select(
        id_col,
        "chunk_idx",
        "start_token",
        F.size(piece).cast("int").alias("n_tokens"),
        F.concat_ws(" ", piece).alias("chunk"),
    )
