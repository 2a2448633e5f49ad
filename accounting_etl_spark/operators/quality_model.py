"""Trainable document-quality classifier (SURVEY §2.11 text-analysis
family): the fastText-style linear filter behind GPT-3/CCNet-era
corpus curation — "train a cheap linear model to tell high-quality
reference text from raw crawl, keep documents the model scores high".

Spark-first shape:

- **Features** stay JVM-side end to end: ``regexp`` tokenization →
  word unigrams + bigrams → MLlib ``HashingTF`` (hashing trick, fixed
  2^18-dim sparse vectors — no vocabulary shuffle, no driver state) →
  optional ``IDF`` weighting (one corpus pass).
- **Training** is MLlib ``LogisticRegression`` (distributed LBFGS) on
  a labeled frame. The natural label source here is weak supervision:
  take the heuristic curation gate's keep/drop verdict (or any
  reference-vs-crawl split) as labels, then the learned model
  generalizes beyond the hand rules. Training input can be
  hash-sampled to a bound exactly like the IVF KMeans path.
- **Scoring** is ``model.transform`` — a map-side vectorized pass
  (the coefficient vector broadcasts with the plan; no shuffle), so
  scoring 100 TB is embarrassingly parallel.

Float caveat (same as IVF's trained centroids): LBFGS float-sum order
is not partitioning-deterministic, so trained-model outputs are
unit-checked for separation quality, not driver-hashed.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_N_FEATURES = 1 << 18


def _featurizer(text_col: str, n_features: int):
    """HashingTF over unigrams+bigrams of the lowercased token stream.
    Returns (input_cols_builder, stages) so train and score share one
    definition."""
    from pyspark.ml.feature import HashingTF

    def build(df: DataFrame) -> DataFrame:
        toks = F.split(F.lower(F.trim(F.col(text_col))), r"\s+")
        grams = F.concat(
            toks,
            F.when(
                F.size(toks) >= 2,
                F.transform(
                    F.slice(toks, 1, F.size(toks) - 1),
                    lambda t, i: F.concat_ws(
                        "_", t, F.element_at(toks, i + 2)
                    ),
                ),
            ).otherwise(F.array().cast("array<string>")),
        )
        return df.withColumn("__grams", grams)

    tf = HashingTF(
        inputCol="__grams", outputCol="features", numFeatures=n_features
    )
    return build, tf


def train_quality_classifier(
    labeled: DataFrame,
    *,
    text_col: str = "text",
    label_col: str = "label",
    n_features: int = _N_FEATURES,
    reg_param: float = 1e-4,
    max_iter: int = 30,
):
    """Fit the linear quality model on (text, label∈{0,1}) rows.
    Returns a fitted PipelineModel-like pair used by
    :func:`score_quality`."""
    from pyspark.ml.classification import LogisticRegression

    build, tf = _featurizer(text_col, n_features)
    feats = tf.transform(build(labeled)).select(
        "features", F.col(label_col).cast("double").alias("label")
    )
    lr = LogisticRegression(
        featuresCol="features",
        labelCol="label",
        regParam=reg_param,
        maxIter=max_iter,
        standardization=False,
    )
    return {"tf": tf, "lr": lr.fit(feats), "text_col": text_col,
            "n_features": n_features}


def score_quality(model, df: DataFrame) -> DataFrame:
    """Append ``quality_prob`` (P(label=1)) to ``df`` — one map-side
    pass, original columns preserved."""
    from pyspark.ml.functions import vector_to_array

    build, _ = _featurizer(model["text_col"], model["n_features"])
    scored = model["lr"].transform(model["tf"].transform(build(df)))
    return scored.withColumn(
        "quality_prob",
        F.element_at(vector_to_array("probability"), 2),
    ).drop("__grams", "features", "rawPrediction", "probability",
           "prediction")


def compression_ratio(
    df: DataFrame,
    *,
    text_col: str = "text",
    out_col: str = "compression_ratio",
) -> DataFrame:
    """zlib-compressed bytes / raw UTF-8 bytes per document — the
    classic boilerplate/repetition quality signal (low ratio =
    template-like text; used alongside the Gopher gram fractions).

    zlib is not expressible in native column expressions, so this is
    one Arrow-batched ``mapInPandas`` pass appending a double column —
    map-side only, no shuffle, payload never leaves the executor.
    Empty text gets ratio 1.0 (nothing to judge).
    """
    from pyspark.sql.types import DoubleType, StructField, StructType

    # build a NEW StructType — StructType.add mutates in place, and
    # df.schema hands back the DataFrame's cached schema object
    out_schema = StructType(
        list(df.schema.fields) + [StructField(out_col, DoubleType())]
    )
    names = list(df.columns)

    def add_ratio(batches):
        import zlib

        for pdf in batches:
            raw = pdf[text_col].fillna("").str.encode("utf-8")
            pdf = pdf.copy()
            pdf[out_col] = [
                (len(zlib.compress(b)) / len(b)) if len(b) else 1.0
                for b in raw
            ]
            yield pdf[names + [out_col]]

    return df.mapInPandas(add_ratio, schema=out_schema)
