"""Corpus report: the data card a training run ships with.

One call composes the profiling operators into a driver-sized summary —
``[section, metric, value_num, value_str]`` long format, so adding
metrics never changes the schema and the whole report stays a handful
of rows whatever the corpus size.

Cost shape (the reason this is safe to run on 100 TB):
- global counts/token stats: ONE aggregation pass (partial aggs);
- language mix: one groupBy over a ≤dozens-cardinality key;
- duplication estimate: distinct(md5) via ONE approx_count_distinct
  sketch in the same global pass — no exact-dedup shuffle;
- quality quantiles: KLL sketches, same pass.

Everything heavy (near-dup rate, contamination, drift) has its own
operator with its own cost dial; the report cites cheap proxies only.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .functions.hashing import md5_long
from .functions.text import lang_id, quality_metrics, token_count


def corpus_report(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    lang_col: str | None = None,
    top_langs: int = 10,
) -> DataFrame:
    """``[section, metric, value_num, value_str]`` summary of a corpus.

    ``lang_col=None`` derives language with the stack's n-gram
    heuristic (functions/text.lang_id); pass an existing column to skip
    that work.
    """
    spark = docs.sparkSession
    n_chars, n_tokens, punct_ratio, stop_ratio, mean_tok = quality_metrics(
        text_col
    )
    lang = F.col(lang_col) if lang_col else lang_id(text_col)
    base = docs.select(
        F.col(id_col).alias("_id"),
        n_tokens.alias("_nt"),
        n_chars.alias("_nc"),
        stop_ratio.alias("_stop"),
        punct_ratio.alias("_punct"),
        md5_long(F.col(text_col)).alias("_h"),
        lang.alias("_lang"),
    )

    g = base.agg(
        F.count("*").alias("n_docs"),
        F.sum("_nt").alias("total_tokens"),
        F.sum("_nc").alias("total_chars"),
        F.avg("_nt").alias("mean_tokens"),
        F.percentile_approx(F.col("_nt").cast("double"), [0.5, 0.95], 10_000)
        .alias("tok_q"),
        F.approx_count_distinct("_h", 0.02).alias("approx_unique_texts"),
        F.avg("_stop").alias("mean_stopword_ratio"),
        F.avg("_punct").alias("mean_punct_ratio"),
    ).first()

    def _f(v, nd: int | None = None) -> float | None:
        # Sum/avg/percentile aggregates are null over an empty corpus;
        # the long format already allows value_num=None, so emit that
        # instead of crashing on float(None).
        if v is None:
            return None
        return round(float(v), nd) if nd is not None else float(v)

    tok_q = g["tok_q"] or [None, None]
    rows: list[tuple[str, str, float | None, str | None]] = [
        ("size", "n_docs", float(g["n_docs"]), None),
        ("size", "total_tokens", _f(g["total_tokens"]), None),
        ("size", "total_chars", _f(g["total_chars"]), None),
        ("size", "mean_tokens_per_doc", _f(g["mean_tokens"], 4), None),
        ("size", "median_tokens_per_doc", _f(tok_q[0]), None),
        ("size", "p95_tokens_per_doc", _f(tok_q[1]), None),
        (
            "duplication",
            "approx_unique_texts",
            float(g["approx_unique_texts"]),
            None,
        ),
        (
            "duplication",
            "approx_exact_dup_frac",
            round(
                max(0.0, 1.0 - g["approx_unique_texts"] / g["n_docs"]), 4
            )
            if g["n_docs"]
            else None,
            None,
        ),
        (
            "quality",
            "mean_stopword_ratio",
            _f(g["mean_stopword_ratio"], 6),
            None,
        ),
        (
            "quality",
            "mean_punct_ratio",
            _f(g["mean_punct_ratio"], 6),
            None,
        ),
    ]

    langs = (
        base.groupBy("_lang")
        .agg(F.count("*").alias("n"))
        .orderBy(F.col("n").desc(), F.col("_lang").asc())
        .limit(top_langs)
        .collect()
    )
    for r in langs:
        rows.append(
            (
                "language_mix",
                f"n_docs[{r['_lang']}]",
                float(r["n"]),
                r["_lang"],
            )
        )

    return spark.createDataFrame(
        rows, "section string, metric string, value_num double, value_str string"
    )
