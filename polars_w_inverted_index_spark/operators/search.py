"""Retrieval over the term inverted index: boolean, phrase, and BM25.

The reference's postings map (main.rs:325-385) answers "which docs carry
this value"; applied to text terms (registry_ext.q_term_postings) that is
a classic search index.  This module adds the query side a user of an
inverted index actually runs:

- :func:`boolean_search` — AND/OR term retrieval (postings intersection /
  union, expressed as a filtered explode + groupBy, never a driver loop);
- :func:`phrase_search` — two-phase: candidate docs via the conjunctive
  term match, adjacency verified only on candidates;
- :func:`bm25_search` — Okapi BM25 ranked retrieval with the standard
  (k1, b) saturation/length normalization, top-k by score.

Scale design (100 TB): the query term list is tiny by definition, so
``term.isin(query)`` prunes the exploded stream BEFORE any shuffle — the
only rows that ever cross the wire are (doc, query-term) hits.  Per-term
document frequencies aggregate to ≤|query| rows (broadcast); corpus
stats (N, avgdl) are one partial-aggregatable pass, and both accept
precomputed values so a standing corpus pays them once, not per query.
Top-k is ``orderBy().limit(k)`` ⇒ TakeOrdered partial top-k per
partition — no global sort.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions.text import tokens


def _norm_terms(terms: list[str]) -> list[str]:
    """Lowercased, deduplicated query terms (order-preserving)."""
    out: list[str] = []
    for t in terms:
        t = t.strip().lower()
        if t and t not in out:
            out.append(t)
    if not out:
        raise ValueError("query needs at least one non-empty term")
    return out


def boolean_search(
    docs: DataFrame,
    terms: list[str],
    *,
    mode: str = "and",
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Docs matching the query terms: ``DataFrame[doc_id, n_matched]``.

    ``mode='and'`` keeps docs containing EVERY query term (postings-list
    intersection); ``'or'`` keeps docs containing any.  ``n_matched`` is
    the number of distinct query terms present.  The explode is pruned by
    ``isin(query)`` before the groupBy, so shuffle volume is O(hits).
    """
    if mode not in ("and", "or"):
        raise ValueError("mode must be 'and' or 'or'")
    q = _norm_terms(terms)
    hits = (
        docs.select(
            id_col,
            F.explode(F.array_distinct(tokens(text_col))).alias("term"),
        )
        .where(F.col("term").isin(q))
        .groupBy(id_col)
        .agg(F.count("*").alias("n_matched"))
    )
    if mode == "and":
        hits = hits.where(F.col("n_matched") == len(q))
    return hits


def phrase_search(
    docs: DataFrame,
    phrase: str,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Docs containing the exact token sequence: ``DataFrame[doc_id]``.

    Two-phase, the standard positional-index strategy without storing
    positions: (1) candidates = conjunctive term match (cheap, postings
    intersection); (2) adjacency verified ONLY on candidates by substring
    match over the space-joined token stream (token-boundary exact — the
    needle is wrapped in the same delimiter).  At 100 TB phase 1 prunes
    the verify scan to the tiny candidate set; with a materialized term
    index (plans/catalog.py) phase 1 never touches the base table.
    """
    q = _norm_terms_keep_dups(phrase.split())
    cand = boolean_search(
        docs, list(dict.fromkeys(q)), mode="and",
        text_col=text_col, id_col=id_col,
    ).select(id_col)
    needle = " " + " ".join(q) + " "
    stream = F.concat(
        F.lit(" "), F.array_join(tokens(text_col), " "), F.lit(" ")
    )
    verified = (
        docs.join(cand, id_col, "left_semi")
        .where(F.instr(stream, F.lit(needle)) > 0)
        .select(id_col)
    )
    return verified


def positional_postings(
    docs: DataFrame,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Positional inverted index: ``DataFrame[term, doc_id, positions]``.

    The reference's postings (value → doc ids, main.rs:325-385) extended
    with 0-based token positions — the artifact phrase queries need.
    Kept FLAT (one row per (term, doc)) rather than nesting all docs
    under the term: row size is bounded by a single document's length,
    so a stop-word appearing in 10^9 docs yields 10^9 bounded rows, not
    one unbounded array — the same discipline as ``postings_chunked``.
    One explode + one shuffle on (term, doc_id), both high-cardinality.
    """
    from ..plans.distribution import ensure_parallelism

    # r14 (guide §2.5): fan tokenize+posexplode out of a
    # single-partition scan (no-op at scale)
    tok = ensure_parallelism(docs.select(id_col, text_col)).select(
        id_col, F.posexplode(tokens(text_col)).alias("pos", "term")
    )
    return tok.groupBy("term", id_col).agg(
        F.sort_array(F.collect_list("pos")).alias("positions")
    )


def phrase_search_indexed(
    index: DataFrame,
    phrase: str,
    *,
    id_col: str = "doc_id",
) -> DataFrame:
    """Phrase search served from :func:`positional_postings`:
    ``DataFrame[doc_id]`` — zero base-table I/O.

    Standard positional-intersection: doc matches iff some position p
    has term_i at p+i for every i.  Each query term pulls its postings
    slice (filter on the index's term column → partition/row-group
    pruning on a term-sorted index layout), slices inner-join on doc_id,
    and the match test is ``array_intersect`` of the i-shifted position
    arrays — per-doc state bounded by one document's positions.  An
    independent implementation of :func:`phrase_search`'s semantics
    (substring scan); the tests pin them equal.
    """
    q = _norm_terms_keep_dups(phrase.split())

    def _shifted(k: int):
        # NB: the lambda must be unary — a second parameter would make
        # Spark pass the ELEMENT INDEX there, not this closure's k.
        return F.transform("positions", lambda p: p - F.lit(k))

    parts = []
    for i, t in enumerate(q):
        parts.append(
            index.where(F.col("term") == t).select(
                F.col(id_col), _shifted(i).alias(f"_p{i}")
            )
        )
    joined = parts[0]
    for i in range(1, len(q)):
        joined = joined.join(parts[i], id_col)
    base = F.col("_p0")
    for i in range(1, len(q)):
        base = F.array_intersect(base, F.col(f"_p{i}"))
    return joined.where(F.size(base) > 0).select(id_col)


def build_search_index(
    docs: DataFrame,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> tuple[DataFrame, DataFrame]:
    """Materialize the ranked-retrieval index: ``(index, stats)``.

    ``index`` is ``[term, doc_id, tf, dl]`` — term frequency and doc
    length per (term, doc) posting, flat rows (the positional-postings
    row-size discipline); ``stats`` is the 1-row ``[n_docs, avgdl]``
    corpus statistics.  Both are pure functions of content: a standing
    corpus writes them once per version (parquet, term-partitioned if
    desired) and every subsequent BM25 query runs from them with ZERO
    base-table I/O via :func:`bm25_search_from_index`.

    One explode + one shuffle on (doc, term) for the index; the stats
    pass aggregates token counts (partial-aggregatable).
    """
    tl = docs.select(F.col(id_col).alias("doc_id"), tokens(text_col).alias("toks"))
    index = (
        tl.select("doc_id", F.size("toks").alias("dl"), F.explode("toks").alias("term"))
        .groupBy("doc_id", "term")
        .agg(F.count("*").alias("tf"), F.max("dl").alias("dl"))
        .select("term", "doc_id", "tf", "dl")
    )
    stats = tl.agg(
        F.count("*").alias("n_docs"),
        F.avg(F.size("toks")).alias("avgdl"),
    )
    return index, stats


def bm25_search_from_index(
    index: DataFrame,
    stats: DataFrame,
    terms: list[str],
    *,
    k1: float = 1.2,
    b: float = 0.75,
    top_k: int | None = 10,
) -> DataFrame:
    """BM25 served from :func:`build_search_index` artifacts — identical
    contract and scores to :func:`bm25_search`, no corpus text touched.

    The term filter hits the RAW index rows first (partition/row-group
    pruning on a term-partitioned layout), so per-query cost is
    O(query terms' postings), independent of corpus size; document
    frequency is the same window-over-hits as the inline form.
    """
    q = _norm_terms(terms)
    tf = index.where(F.col("term").isin(q))
    return _bm25_score(tf, stats, k1=k1, b=b, top_k=top_k)


def _bm25_score(
    tf: DataFrame,
    stats: DataFrame,
    *,
    k1: float,
    b: float,
    top_k: int | None,
) -> DataFrame:
    """Shared BM25 scorer over ``[term, doc_id, tf, dl]`` hit rows.

    Document frequency is a window over the hit rows (already reduced
    to O(query-term hits)) instead of a second aggregation branch:
    Spark does not reuse the tf subtree across branches (column pruning
    makes them differ), so the join form would scan the corpus twice —
    the window form scans it once.  Top-k is orderBy().limit(k) ⇒
    TakeOrdered partial top-k per partition, never a global sort.
    """
    from pyspark.sql.window import Window

    scored = tf.withColumn(
        "df", F.count("*").over(Window.partitionBy("term"))
    ).crossJoin(F.broadcast(stats))
    idf = F.log(
        F.lit(1.0)
        + (F.col("n_docs") - F.col("df") + F.lit(0.5))
        / (F.col("df") + F.lit(0.5))
    )
    tf_d = F.col("tf").cast("double")
    norm = tf_d + F.lit(k1) * (
        F.lit(1.0 - b) + F.lit(b) * F.col("dl") / F.col("avgdl")
    )
    contrib = idf * tf_d * F.lit(k1 + 1.0) / norm
    out = (
        scored.select("doc_id", contrib.alias("w"))
        .groupBy("doc_id")
        .agg(F.sum("w").alias("score"), F.count("*").alias("n_matched"))
        .orderBy(F.desc("score"), F.col("doc_id"))
    )
    if top_k is not None:
        out = out.limit(int(top_k))
    return out


def _norm_terms_keep_dups(terms: list[str]) -> list[str]:
    """Lowercased query terms, duplicates preserved (phrase order)."""
    out = [t.strip().lower() for t in terms if t.strip()]
    if not out:
        raise ValueError("query needs at least one non-empty term")
    return out


def bm25_search(
    docs: DataFrame,
    terms: list[str],
    *,
    k1: float = 1.2,
    b: float = 0.75,
    top_k: int | None = 10,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_docs: int | None = None,
    avgdl: float | None = None,
) -> DataFrame:
    """Okapi BM25 ranked retrieval:
    ``DataFrame[doc_id, score, n_matched]`` (top_k rows, ties broken by
    ascending doc id so results are deterministic).

    idf(t) = ln(1 + (N - df + 0.5)/(df + 0.5))   — Lucene's non-negative
    form; score(d) = Σ_t idf·tf·(k1+1)/(tf + k1·(1-b+b·dl/avgdl)).

    ``n_docs``/``avgdl`` accept precomputed corpus statistics (a standing
    index computes them once per corpus version); when omitted they cost
    one partial-aggregatable pass over token counts.
    """
    q = _norm_terms(terms)
    from ..plans.distribution import ensure_parallelism

    # r14 (guide §2.5): fan the tokenize out of a single-partition scan
    # (no-op at scale)
    tl = ensure_parallelism(docs.select(id_col, text_col)).select(
        F.col(id_col), tokens(text_col).alias("toks")
    )

    if n_docs is None or avgdl is None:
        stats = tl.agg(
            F.count("*").alias("n_docs"),
            F.avg(F.size("toks")).alias("avgdl"),
        )
    else:
        stats = docs.sparkSession.range(1).select(
            F.lit(int(n_docs)).alias("n_docs"),
            F.lit(float(avgdl)).alias("avgdl"),
        )

    # dl rides the explode so no separate doc-length join is needed;
    # the isin prune keeps shuffle volume at O(query-term hits).
    tf = (
        tl.select(
            F.col(id_col).alias("doc_id"),
            F.size("toks").alias("dl"),
            F.explode("toks").alias("term"),
        )
        .where(F.col("term").isin(q))
        .groupBy("doc_id", "term")
        .agg(F.count("*").alias("tf"), F.max("dl").alias("dl"))
    )
    return _bm25_score(tf, stats, k1=k1, b=b, top_k=top_k)


def top_tfidf_terms(
    docs: DataFrame,
    k: int = 10,
    text_col: str = "text",
    id_col: str = "doc_id",
    round_digits: int = 6,
) -> DataFrame:
    """Per-document keyword extraction: ``[<id>, term, tf, tfidf, rank]``
    — each document's ``k`` highest-TF-IDF terms.

    Two aggregations over the exploded token table: per-(doc, term)
    term frequency, and per-term document frequency (vocabulary-sized,
    broadcastable at scoring time — the unigram-LM shape).  Smoothed
    idf = ln((N + 1)/(df + 1)) + 1 (the scikit-learn convention: never
    negative, never /0).  Ranking is a per-doc window — state bounded
    by one document's vocabulary — with the cross-engine tie rule
    (rounded score DESC, term ASC).  Scores are rounded BEFORE ranking
    so tie order is identical in any engine (the similarity.py
    discipline).
    """
    from ..plans.distribution import ensure_parallelism

    # r14 (guide §2.5): fan tokenize+explode out of a single-partition
    # scan (no-op at scale)
    tl = ensure_parallelism(docs.select(id_col, text_col)).select(
        F.col(id_col).alias("_id"), F.explode(tokens(text_col)).alias("term")
    )
    tf = tl.groupBy("_id", "term").agg(F.count("*").alias("tf"))
    df_t = tf.groupBy("term").agg(F.count("*").alias("df"))
    n_docs = docs.select(F.col(id_col)).distinct().count()
    idf = F.log((F.lit(float(n_docs + 1))) / (F.col("df") + 1)) + 1.0
    scored = tf.join(F.broadcast(df_t), "term").select(
        "_id",
        "term",
        "tf",
        F.round(F.col("tf") * idf, round_digits).alias("tfidf"),
    )
    w = Window.partitionBy("_id").orderBy(
        F.col("tfidf").desc(), F.col("term").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select(F.col("_id").alias(id_col), "term", "tf", "tfidf", "rank")
    )
