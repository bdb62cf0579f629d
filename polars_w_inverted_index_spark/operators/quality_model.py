"""Model-based quality filtering: a hashed-feature linear classifier.

Heuristic gates (functions/text.quality_metrics) catch mechanical junk;
production pipelines add a LEARNED filter — a cheap linear classifier
over bag-of-words features scoring "does this look like reference-
quality text" (the CCNet / GPT-3 / DCLM fastText-classifier pattern) —
and keep the heuristics as the labeling prior.  Spark-first build:

- features: ``HashingTF`` over the stack's whitespace tokens — feature
  hashing needs NO vocabulary pass (the one shuffle a count-vectorizer
  would cost at 100 TB) and gives a fixed-width sparse vector;
- model: ``pyspark.ml`` LogisticRegression — distributed L-BFGS whose
  per-iteration cost is one treeAggregate of gradient partials
  (corpus-partitioned map + log-depth combine, no data shuffle);
- scoring: the fitted model is a narrow map (broadcast coefficients,
  one sparse dot per row) — embarrassingly parallel at any scale;
- labels: ``weak_quality_labels`` derives a {0,1} prior from the
  heuristic metrics so the classifier can be bootstrapped corpus-only;
  swapping in human/LLM labels is the same `label` column.

The classifier generalizes past its weak prior because hashing mixes
the full vocabulary: tokens correlated with heuristic-clean text get
positive weight even in documents the heuristics themselves misjudge.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.text import quality_metrics, tokens


def weak_quality_labels(
    docs: DataFrame,
    text_col: str = "text",
    min_tokens: int = 8,
    min_stopword_frac: float = 0.05,
    max_punct_frac: float = 0.2,
) -> DataFrame:
    """Adds ``label`` ∈ {0.0, 1.0}: the heuristic-quality prior.

    1.0 = passes all gates (length, stopword density, punctuation
    ratio — the quality_metrics trio); 0.0 otherwise.  Deliberately
    coarse: it is a *training prior*, not the filter itself.
    """
    from pyspark.sql import functions as F

    from ..functions.text import free_col_name, tokens

    # shared tokenize (materialized column, kept Project boundary) —
    # two of the three gate signals consume the token array; the name is
    # picked collision-free so a caller's own '_qm_toks' column survives
    tcol = free_col_name(docs, "_qm_toks")
    n_chars, n_tokens, punct_ratio, stop_ratio, _ = quality_metrics(
        text_col, tok=F.col(tcol)
    )
    return (
        docs.withColumn(tcol, tokens(text_col))
        .withColumn(
            "label",
            (
                (n_tokens >= min_tokens)
                & (stop_ratio >= min_stopword_frac)
                & (punct_ratio <= max_punct_frac)
            ).cast("double"),
        )
        .drop(tcol)
    )


def train_quality_model(
    labeled: DataFrame,
    text_col: str = "text",
    label_col: str = "label",
    n_features: int = 1 << 16,
    reg_param: float = 0.01,
    max_iter: int = 30,
):
    """Fit tokens → HashingTF → LogisticRegression; returns the fitted
    ``PipelineModel``.  ``n_features`` trades collision rate against
    coefficient-vector size (2^16 doubles = 512 KB broadcast — grow to
    2^20 for a 100 TB vocabulary; still driver-trivial)."""
    from pyspark.ml import Pipeline
    from pyspark.ml.classification import LogisticRegression
    from pyspark.ml.feature import HashingTF

    feats = labeled.withColumn("_toks", tokens(text_col))
    tf = HashingTF(
        inputCol="_toks", outputCol="features", numFeatures=n_features
    )
    lr = LogisticRegression(
        featuresCol="features",
        labelCol=label_col,
        regParam=reg_param,
        maxIter=max_iter,
    )
    return Pipeline(stages=[tf, lr]).fit(feats)


def score_quality(
    model,
    docs: DataFrame,
    text_col: str = "text",
    out_col: str = "quality_score",
) -> DataFrame:
    """Adds ``out_col`` = P(label=1 | text) from the fitted model and
    drops the intermediate feature columns — input schema + one double.
    """
    from pyspark.ml.functions import vector_to_array

    scored = model.transform(docs.withColumn("_toks", tokens(text_col)))
    return scored.withColumn(
        out_col, vector_to_array("probability")[1]
    ).drop("_toks", "features", "rawPrediction", "probability", "prediction")


def quality_filter(
    model,
    docs: DataFrame,
    threshold: float = 0.5,
    text_col: str = "text",
) -> DataFrame:
    """Rows scoring ≥ threshold, score column retained for audit."""
    return score_quality(model, docs, text_col).where(
        F.col("quality_score") >= threshold
    )
