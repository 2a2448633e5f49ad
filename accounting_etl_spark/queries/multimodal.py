"""Multimodal + scale-path dedup queries.

``multimodal_meta`` is oracle-checked (byte lengths + md5 checksums
are engine-portable). The mapInPandas feature extraction and the
MinHash/SimHash candidate generators are genuinely non-SQL-
expressible (hash internals differ per engine), so they take the
driver's rows-only check and are unit-tested against the exact
Jaccard baseline (tests/test_dedup.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.dedup import minhash_candidates, simhash_candidates
from ..operators.multimodal import attach_payload, extract_media_features
from ..sources.tables import load_table
from . import Q


def q_multimodal_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Typed metadata over opaque payload bytes (oracle-checked)."""
    docs = load_table(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        F.element_at(
            F.array(F.lit("image"), F.lit("audio"), F.lit("video")),
            (F.col("doc_id") % 3 + 1).cast("int"),
        ).alias("modality"),
        F.octet_length("text").cast("bigint").alias("n_bytes"),
        F.md5(F.encode(F.col("text"), "UTF-8")).alias("checksum"),
    )


_META_SQL = """
SELECT doc_id,
       (['image', 'audio', 'video'])[CAST(doc_id % 3 + 1 AS INTEGER)] AS modality,
       CAST(strlen(text) AS BIGINT) AS n_bytes,
       md5(text) AS checksum
FROM documents
"""


def q_multimodal_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary decode/feature-extract pipeline (rows-only check).

    Real plumbing (binary column → Arrow-batched mapInPandas → typed
    feature rows); decode stubbed deterministically — codecs absent
    in this container (operators/multimodal.py).
    """
    docs = load_table(spark, sf_dir, "documents")
    return extract_media_features(attach_payload(docs))


def q_near_dup_minhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash-LSH candidates (rows-only; the 100 TB near-dup path).

    Candidate pairs via banded min-hash signatures; engine-specific
    hashing (xxhash64) makes this non-oracle-expressible. Recall vs
    the exact-Jaccard baseline is unit-tested.
    """
    docs = load_table(spark, sf_dir, "documents")
    return minhash_candidates(
        docs, id_col="doc_id", text_col="text", num_hashes=16, bands=4
    )


def q_near_dup_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash near-dup pairs with Hamming <= 3 (rows-only)."""
    docs = load_table(spark, sf_dir, "documents")
    return simhash_candidates(docs, id_col="doc_id", text_col="text")


def q_near_dup_hash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash-LSH + SimHash candidate generators in one union-tagged
    entry (driver cap: the correctness gate records at most 50
    registry entries). variant 'minhash' has no distance column;
    'simhash' carries the Hamming distance. Both banded equi-joins —
    no all-pairs stage (operators/dedup.py)."""
    mh = q_near_dup_minhash(spark, sf_dir).select(
        F.lit("minhash").alias("variant"),
        "id_a",
        "id_b",
        F.lit(None).cast("int").alias("hamming"),
    )
    sh = q_near_dup_simhash(spark, sf_dir).select(
        F.lit("simhash").alias("variant"),
        "id_a",
        "id_b",
        F.col("hamming").cast("int").alias("hamming"),
    )
    return mh.unionByName(sh)


QUERIES: dict[str, Q] = {
    "multimodal_meta": Q(q_multimodal_meta, _META_SQL),
    "multimodal_features": Q(q_multimodal_features, None),
    "near_dup_hash": Q(
        q_near_dup_hash,
        None,
        variants={"minhash": q_near_dup_minhash, "simhash": q_near_dup_simhash},
    ),
}
