"""Context-window document chunking (sliding token windows with overlap).

A training pipeline feeding a fixed-context model splits every document
into windows of ``window`` tokens advancing by ``stride`` (< window ⇒
overlapping context, the standard long-document recipe).  This is a pure
narrow map — tokenize, generate start offsets, slice, posexplode — with
NO shuffle at any scale; output volume is ≈ len/stride rows per doc and
a 10 GB document streams through one task as array expressions.

Redundant-tail suppression: when the previous window already reached the
end of the document, the next start would yield a window wholly contained
in it; those starts are dropped (a start ``s > 0`` is kept only while the
previous window ``s - stride`` ended before the document did).  Every
token is still covered — chunk i ends at ``min(s + window, len)``.

The reference engine has no chunking (it stops at postings); this is
driver-mandated LLM-pipeline surface, same contract as packing
(operators/packing.py) which consumes these chunks' token counts.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.text import tokens, tokens_sql


def chunk_documents(
    docs: DataFrame,
    *,
    window: int = 128,
    stride: int = 96,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_tokens: int = 1,
) -> DataFrame:
    """``DataFrame[doc_id, chunk_idx, n_tokens, chunk_text]``.

    ``chunk_idx`` numbers the kept windows 0..k-1 per document;
    ``chunk_text`` is the space-joined token window (tokenization is the
    engine-wide whitespace/lowercase normal form, functions/text.py).
    Documents with fewer than ``min_tokens`` tokens yield no rows.
    """
    if window < 1 or stride < 1:
        raise ValueError("window and stride must be >= 1")
    if stride > window:
        raise ValueError("stride > window would skip tokens")
    if min_tokens < 1:
        # a zero-token chunk is meaningless AND sits exactly on the
        # engines' one join-semantics divergence (Spark array_join([])
        # = '' vs DuckDB array_to_string([]) = NULL — the r8 fuzz
        # finding), so refuse rather than emit oracle-unstable rows
        raise ValueError("min_tokens must be >= 1")
    toks = tokens(text_col)
    n = F.size("toks")
    starts = F.when(
        n > 0, F.sequence(F.lit(0), n - 1, F.lit(stride))
    ).otherwise(F.array().cast("array<int>"))
    # keep start 0 always; keep s > 0 only if the previous window
    # (s - stride) stopped short of the end — drops contained tails
    kept = F.filter(
        starts, lambda s: (s == 0) | (s - stride + window < n)
    )
    chunked = (
        docs.select(F.col(id_col), toks.alias("toks"))
        .select(id_col, "toks", F.posexplode(kept).alias("chunk_idx", "s"))
        .select(
            id_col,
            "chunk_idx",
            F.slice("toks", F.col("s") + 1, window).alias("ctoks"),
        )
        .select(
            id_col,
            "chunk_idx",
            F.size("ctoks").cast("long").alias("n_tokens"),
            F.array_join("ctoks", " ").alias("chunk_text"),
        )
        .where(F.col("n_tokens") >= min_tokens)
    )
    return chunked


def chunk_documents_sql(
    *,
    window: int = 128,
    stride: int = 96,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_tokens: int = 1,
    table: str = "documents",
) -> str:
    """DuckDB twin of :func:`chunk_documents` (oracle evidence)."""
    return f"""
    WITH tok AS (
      SELECT {id_col}, {tokens_sql(text_col)} AS toks FROM {table}
    ),
    st AS (
      SELECT {id_col}, toks, len(toks) AS n,
             unnest(range(0, greatest(len(toks), 1), {stride})) AS s
      FROM tok WHERE len(toks) > 0
    ),
    kept AS (
      SELECT {id_col}, toks, n, s,
             ROW_NUMBER() OVER (
               PARTITION BY {id_col} ORDER BY s
             ) - 1 AS chunk_idx
      FROM st WHERE s = 0 OR s - {stride} + {window} < n
    )
    SELECT {id_col}, chunk_idx,
           CAST(len(toks[s + 1 : s + {window}]) AS BIGINT) AS n_tokens,
           array_to_string(toks[s + 1 : s + {window}], ' ') AS chunk_text
    FROM kept
    WHERE len(toks[s + 1 : s + {window}]) >= {min_tokens}
    """
