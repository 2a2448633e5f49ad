"""Streaming incremental dedup — the T-family twin of
operators/incremental.py.

A continuously-ingesting pipeline dedups each micro-batch against the
already-curated corpus: a *stream-static* left join of the stream on
the persisted ``(content_hash, keep_id)`` index (the static side is
re-read per micro-batch, so a replaced index snapshot is picked up
without restarting the query), plus within-stream dedup on the hash
under a watermark so state stays bounded (``dropDuplicates`` without
a watermark grows state forever — not the 100 TB posture).

Ordering note: within-stream "first wins" in a stream is arrival
order, not min-id (micro-batch boundaries are not deterministic), so
the streaming verdict is ``is_new_content`` — content seen neither in
the corpus nor earlier in the stream — rather than the batch form's
min-id survivor. The batch operator stays the oracle for survivor
identity; the stream decides admission.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.text import normalize_text


def stream_dedup_against_index(
    stream: DataFrame,
    index: DataFrame,
    *,
    text_col: str = "text",
    ts_col: str | None = None,
    watermark: str = "1 hour",
) -> DataFrame:
    """Admission-filtered stream: rows whose normalized content is in
    the corpus index are dropped; repeated content within the stream
    passes once.

    ``index`` is a static DataFrame (e.g. a parquet read of the
    persisted exact index) with a ``content_hash`` column. When
    ``ts_col`` is given, within-stream dedup uses
    ``dropDuplicatesWithinWatermark`` on the hash — bounded state;
    without it, plain ``dropDuplicates`` (exact, unbounded state —
    test/backfill use only).
    """
    hashed = stream.withColumn(
        "content_hash", F.md5(normalize_text(F.col(text_col)))
    )
    # stream-static LEFT ANTI join: only content absent from the
    # corpus survives; the static side shuffles/broadcasts per
    # micro-batch under the batch planner (AQE sizes it)
    fresh = hashed.join(
        index.select("content_hash"), "content_hash", "left_anti"
    )
    if ts_col is not None:
        return fresh.withWatermark(
            ts_col, watermark
        ).dropDuplicatesWithinWatermark(["content_hash"])
    return fresh.dropDuplicates(["content_hash"])
