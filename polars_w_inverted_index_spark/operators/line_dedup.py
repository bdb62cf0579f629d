"""Line-level boilerplate removal (CCNet / RefinedWeb line dedup).

Web-scale corpora carry navigation chrome, cookie banners, and footers
repeated across thousands of pages; document-level dedup never sees
them because the surrounding text differs.  The standard fix dedups at
LINE granularity: a line whose document frequency exceeds a threshold
is boilerplate — remove it from every document, keep the rest of the
text intact.

Plan shape (all JVM expressions):
- explode lines with position (``posexplode(split(text, '\\n'))``) —
  narrow;
- document frequency per normalized line: distinct (doc, line-hash) →
  groupBy hash — ONE shuffle on a uniform 60-bit key, partial-agg
  bounded;
- flag hot lines via an equi-join of the exploded lines against the hot
  set (the hot set is df-thresholded — small by construction, AQE
  broadcasts it);
- reassemble: groupBy doc, ``array_sort(collect_list(struct(idx,
  line)))`` + join — per-task state bounded by ONE document, the same
  bound every per-doc operator here obeys.

Normalization for the frequency key is trim + lowercase (CCNet hashes
normalized lines so cosmetic whitespace/case drift doesn't split a
banner's count); removal keeps the ORIGINAL line bytes for survivors.
Blank lines are structure, not content: never counted, never removed.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.hashing import md5_long


def _line_key(line):
    return md5_long(F.lower(F.trim(line)))


def line_doc_frequency(
    docs: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """``[line_key, line, df]`` — per normalized line, the number of
    DISTINCT documents containing it (a line repeated inside one doc
    counts once; ``line`` is one representative original spelling —
    the min — for inspection)."""
    from ..plans.distribution import ensure_parallelism

    # r14 (guide §2.5): fan line-split + hash out of a single-partition
    # scan (no-op at scale)
    lines = ensure_parallelism(docs.select(id_col, text_col)).select(
        F.col(id_col).alias("_id"),
        F.explode(F.split(F.col(text_col), "\n")).alias("line"),
    ).where(F.trim("line") != "")
    return (
        lines.select("_id", _line_key(F.col("line")).alias("line_key"),
                     "line")
        .groupBy("line_key")
        .agg(
            F.count_distinct("_id").alias("df"),
            F.min("line").alias("line"),
        )
        .select("line_key", "line", "df")
    )


def remove_boilerplate_lines(
    docs: DataFrame,
    max_line_df: int,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Strip lines appearing in more than ``max_line_df`` documents.

    Returns the input schema with ``text_col`` rewritten plus
    ``n_removed_lines`` for audit.  Documents whose every line was
    boilerplate survive with empty text (dropping is the quality gate's
    decision, not this operator's).  ``max_line_df`` >= corpus size is
    the identity.
    """
    if max_line_df < 1:
        raise ValueError(f"max_line_df must be >= 1, got {max_line_df}")
    hot = (
        line_doc_frequency(docs, text_col, id_col)
        .where(F.col("df") > max_line_df)
        .select("line_key")
    )
    lines = docs.select(
        F.col(id_col).alias("_id"),
        F.posexplode(F.split(F.col(text_col), "\n")).alias("idx", "line"),
    ).withColumn(
        "line_key",
        F.when(F.trim("line") != "", _line_key(F.col("line"))),
    )
    kept = lines.join(hot, "line_key", "left_anti")
    rebuilt = kept.groupBy("_id").agg(
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("idx", "line"))),
                lambda s: s.getField("line"),
            ),
            "\n",
        ).alias("_new_text"),
        F.count("*").alias("_n_kept"),
    )
    n_lines = F.size(F.split(F.col(text_col), "\n"))
    out = (
        docs.join(rebuilt, docs[id_col] == rebuilt["_id"], "left")
        .withColumn(
            "n_removed_lines",
            n_lines - F.coalesce(F.col("_n_kept"), F.lit(0)),
        )
        .withColumn(text_col, F.coalesce(F.col("_new_text"), F.lit("")))
        .drop("_id", "_new_text", "_n_kept")
    )
    return out
