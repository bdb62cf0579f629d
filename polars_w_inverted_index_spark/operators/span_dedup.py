"""Cross-document verbatim-span scrubbing (ExactSubstr-style dedup).

Document-level dedup (exact/minhash) drops whole near-identical
documents and line-level dedup strips hot boilerplate LINES; what
neither catches is a long verbatim passage (a license block, a quoted
article, a template paragraph) embedded mid-document in otherwise
distinct pages.  Lee et al. 2021 ("Deduplicating Training Data Makes
Language Models Better") remove such repeats with a corpus-wide suffix
array; a suffix array is a single global sorted structure — the wrong
shape for a distributed engine.  The Spark-first approximation used by
large pipelines replaces it with fixed-k rolling shingles:

1. every k-token window of every document is keyed (narrow transform —
   one 60-bit hash per window, positions kept);
2. one groupBy counts window occurrences corpus-wide — uniform
   high-cardinality keys, partial aggregation, the corpus's ONE shuffle;
3. windows with ``count >= min_count`` mark their [pos, pos+k) token
   interval; per document the intervals merge into maximal spans (a
   JVM-side fold over the sorted starts — per-doc work, no shuffle
   beyond the doc_id groupBy);
4. scrubbing rebuilds the text keeping tokens outside every span.

Any repeat of length >= k tokens is covered by at least one hot window
(the windows tile it), so the k-gram form finds every repeat the suffix
array would at granularity k; shorter repeats are intentionally kept
(that is the precision dial — Lee et al. use 50 tokens).  ALL
occurrences of a repeated span are scrubbed (deterministic and
order-free at any partitioning; keeping "the first" occurrence would
impose a global document order — exactly the coordination a 100 TB
corpus cannot afford).

Cost shape: |tokens| window rows through one count shuffle; the df-cut
analogy of the pair generators applies — there is no self-join at all,
so no hot-key quadratic bucket exists by construction.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.hashing import md5_long
from ..functions.text import tokens

# Window-hash variant identifiers.  A persisted window-count artifact is
# a table of OPAQUE hash keys — joining counts built with one hash
# function against windows built with another would silently find
# nothing (same failure mode as a k mismatch, which is already gated).
# Every artifact writer records which variant built it and every reader
# gates on it; a future default flip then fails loudly instead of
# serving an empty scrub.
HASH_XXH64 = "xxhash64-chain-v1"   # default: per-token xxhash64 chained
HASH_MD5 = "md5-gram-v1"           # portable=True: md5 over the joined gram


def hash_variant(portable: bool) -> str:
    return HASH_MD5 if portable else HASH_XXH64


def _window_rows(
    docs: DataFrame,
    k: int,
    text_col: str,
    id_col: str,
    portable: bool = False,
) -> DataFrame:
    """``[doc_id, pos, sh]`` — one 64-bit hash per k-token window.

    Default path: tokens explode to rows, ONE codegen ``xxhash64`` per
    token, then the window key combines the k neighboring token hashes
    with a single variadic ``xxhash64`` over ``lead()`` columns (one
    window sort on doc_id).  The array-side alternative — a
    higher-order ``transform`` building slice+join+md5 per window — is
    interpreted per element and measured 12× slower at sf0.1; the
    window sort's shuffle is the same order as the hot-count shuffle
    the pipeline already pays, so the trade buys pure CPU.

    ``portable=True`` switches to the md5-based array form whose hash
    the DuckDB oracle can reproduce (:func:`..functions.hashing
    .md5_long_sql`) — the cross-engine verification path; both paths
    produce identical hot-window DECISIONS (hashes are opaque keys; a
    collision needs ~2^32 windows per 64-bit birthday pair).
    """
    tok = tokens(text_col)
    if portable:
        grams = F.transform(
            F.sequence(F.lit(0), F.size(tok) - k),
            lambda i: F.struct(
                i.alias("pos"),
                md5_long(
                    F.array_join(F.slice(tok, i + 1, k), "\x1f")
                ).alias("sh"),
            ),
        )
        return (
            docs.where(F.size(tok) >= k)
            .select(
                F.col(id_col).alias("doc_id"), F.explode(grams).alias("g")
            )
            .select("doc_id", "g.pos", "g.sh")
        )
    from pyspark.sql import Window

    base = (
        docs.where(F.size(tok) >= k)
        .select(
            F.col(id_col).alias("doc_id"),
            F.size(tok).alias("_nt"),
            F.posexplode(tok).alias("pos", "_t"),
        )
        .withColumn("_h", F.xxhash64("_t"))
    )
    w = Window.partitionBy("doc_id").orderBy("pos")
    parts = [F.col("_h")] + [
        F.lead("_h", j).over(w) for j in range(1, k)
    ]
    return (
        base.select(
            "doc_id",
            "pos",
            "_nt",
            F.xxhash64(*parts).alias("sh"),
        )
        # drop tail positions: xxhash64 SKIPS null args, so an unguarded
        # tail window would hash like a shorter gram and alias other keys
        .where(F.col("pos") <= F.col("_nt") - k)
        .select("doc_id", "pos", "sh")
    )


def repeated_spans(
    docs: DataFrame,
    k: int = 8,
    min_count: int = 2,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """``[doc_id, span_start, span_end]`` — maximal merged token
    intervals (end exclusive) covered by k-token windows occurring
    >= ``min_count`` times corpus-wide (all occurrences, including
    within-document repeats)."""
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    win = _window_rows(docs, k, text_col, id_col)
    hot = (
        win.groupBy("sh")
        .agg(F.count("*").alias("n"))
        .where(F.col("n") >= min_count)
        .select("sh")
    )
    marked = win.join(hot, "sh", "left_semi")
    return _merge_marked_to_spans(marked, k)


def _merge_marked_to_spans(marked: DataFrame, k: int) -> DataFrame:
    """``[doc_id, span_start, span_end]`` — merge hot-window [pos,
    pos+k) intervals per doc: starts sorted, fold keeps a growing array
    of disjoint (s, e) structs — per-doc CPU, 1 shuffle."""
    merged = (
        marked.groupBy("doc_id")
        .agg(F.array_sort(F.collect_list("pos")).alias("ps"))
        .select(
            "doc_id",
            F.aggregate(
                "ps",
                F.array().cast("array<struct<s:long,e:long>>"),
                lambda acc, p: F.when(
                    (F.size(acc) > 0)
                    & (p <= F.element_at(acc, -1).getField("e")),
                    F.concat(
                        F.slice(acc, 1, F.size(acc) - 1),
                        F.array(
                            F.struct(
                                F.element_at(acc, -1)
                                .getField("s")
                                .alias("s"),
                                F.greatest(
                                    F.element_at(acc, -1).getField("e"),
                                    (p + k).cast("long"),
                                ).alias("e"),
                            )
                        ),
                    ),
                ).otherwise(
                    F.concat(
                        acc,
                        F.array(
                            F.struct(
                                p.cast("long").alias("s"),
                                (p + k).cast("long").alias("e"),
                            )
                        ),
                    )
                ),
            ).alias("spans"),
        )
        .select("doc_id", F.explode("spans").alias("sp"))
        .select(
            "doc_id",
            F.col("sp.s").alias("span_start"),
            F.col("sp.e").alias("span_end"),
        )
    )
    return merged


def window_counts(
    docs: DataFrame,
    k: int = 8,
    text_col: str = "text",
    id_col: str = "doc_id",
    portable: bool = False,
) -> DataFrame:
    """``[sh, n]`` — corpus-wide occurrence count per k-token window.

    The reusable ARTIFACT of span scrubbing (cf. the postings
    IndexCatalog / minhash band table): a pure function of corpus
    content, built with the one corpus-wide shuffle, persistable as
    parquet and consumed by :func:`scrub_repeated_spans_against` so
    ingest batches never rescan the standing corpus.

    A persisted artifact is keyed by (k, hash variant) — record BOTH
    next to it (:data:`hash_variant`; the streaming state marker does,
    streaming/span_scrub.py) and read it back with the same ``portable``
    flag: hashes from the other variant never match, so a mismatch
    would silently scrub nothing."""
    return (
        _window_rows(docs, k, text_col, id_col, portable=portable)
        .groupBy("sh")
        .agg(F.count("*").alias("n"))
    )


def scrub_repeated_spans_against(
    corpus_counts: DataFrame,
    batch: DataFrame,
    k: int = 8,
    min_count: int = 2,
    text_col: str = "text",
    id_col: str = "doc_id",
    portable: bool = False,
    _precomputed_windows: DataFrame | None = None,
) -> DataFrame:
    """Incremental-ingest twin of :func:`scrub_repeated_spans`: scrub a
    NEW batch against a standing corpus's :func:`window_counts` table.

    A batch window is hot when corpus occurrences + batch occurrences
    reach ``min_count`` — identical semantics to running the batch
    through the full-corpus operator with the corpus text present, but
    per-batch cost is O(batch windows).  The corpus contribution is an
    INNER join deliberately, not a left-outer: Spark can only broadcast
    the RIGHT side of a LeftOuter join, so batch-left-outer-corpus would
    sort-merge-shuffle the corpus-sized count table on EVERY batch; the
    inner form lets AQE broadcast the small batch side and the
    batch-only-hot windows come back via a cheap union.
    ``corpus_counts`` may hold MULTIPLE rows per ``sh`` (the streaming
    state stores per-batch delta partitions); occurrences are summed
    AFTER the join, so the aggregation stays batch-keyed — pre-summing
    the whole table per batch would be corpus-sized work.
    ``k`` AND ``portable`` (the hash variant) must match the table's
    build-time dials — window hashes of a different k or a different
    hash function never collide meaningfully, so the join would
    silently find nothing; pass the same dials you built with (the
    streaming state marker records and gates both).
    ``_precomputed_windows`` lets the streaming wrapper reuse its
    already-built window frame (the tokenize+hash stage is the dominant
    narrow cost and must not run twice per batch).
    """
    win = (
        _precomputed_windows
        if _precomputed_windows is not None
        else _window_rows(batch, k, text_col, id_col, portable=portable)
    )
    batch_counts = win.groupBy("sh").agg(F.count("*").alias("bn"))
    corpus_hot = (
        batch_counts.join(
            corpus_counts.select("sh", F.col("n").alias("cn")), "sh"
        )
        .groupBy("sh")
        .agg(
            F.max("bn").alias("bn"),  # bn is per-sh constant
            F.sum("cn").alias("cn"),  # sums across delta partitions
        )
        .where((F.col("cn") + F.col("bn")) >= min_count)
        .select("sh")
    )
    batch_hot = batch_counts.where(F.col("bn") >= min_count).select("sh")
    hot = batch_hot.union(corpus_hot).distinct()
    marked = win.join(hot, "sh", "left_semi")
    return _scrub_with_marked(batch, marked, k, text_col, id_col)


def scrub_repeated_spans(
    docs: DataFrame,
    k: int = 8,
    min_count: int = 2,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Input schema with ``text_col`` rebuilt at BYTE FIDELITY from the
    characters outside every repeated span, plus ``n_removed_tokens``
    for audit.

    Window keys are normalized (lowercased whitespace tokens) so
    detection is case/spacing-insensitive, but the rebuild maps the
    token-index spans back to character offsets in the ORIGINAL text
    (Lee et al. remove repeats at byte fidelity; a training pipeline
    wants original casing/whitespace outside spans preserved).
    Documents with no repeated span pass through byte-identical.
    Removed character range per span: from the first span token's start
    through the start of the token AFTER the span (swallowing the
    separator so kept regions join on their original whitespace); a
    span reaching the last token swallows its PRECEDING separator
    instead (there is no following token), and a whole-document span
    scrubs to the empty string.
    """
    return _scrub_with_spans(
        docs, repeated_spans(docs, k, min_count, text_col, id_col),
        text_col, id_col,
    )


def _scrub_with_marked(
    docs: DataFrame, marked: DataFrame, k: int, text_col: str, id_col: str
) -> DataFrame:
    return _scrub_with_spans(
        docs, _merge_marked_to_spans(marked, k), text_col, id_col
    )


def _token_offsets(text_col: str):
    """``array<struct<s:long,e:long>>`` — character offsets (0-based,
    end exclusive) of each whitespace-delimited token of the ORIGINAL
    text, index-aligned with :func:`..functions.text.tokens` (both are
    the maximal non-whitespace runs, in order; ``tokens`` additionally
    lowercases, which does not move boundaries).  Built JVM-side: split
    at the zero-width whitespace↔non-whitespace transitions gives
    alternating runs, then one fold accumulates a running char cursor
    and keeps the non-whitespace runs' (start, end)."""
    c = F.col(text_col)
    chunks = F.split(c, r"(?<=\s)(?=\S)|(?<=\S)(?=\s)")
    acc0 = F.struct(
        F.lit(0).cast("long").alias("off"),
        F.array().cast("array<struct<s:long,e:long>>").alias("offs"),
    )
    return F.aggregate(
        chunks,
        acc0,
        lambda acc, ch: F.struct(
            (acc.getField("off") + F.length(ch)).alias("off"),
            F.when(
                (F.length(ch) == 0) | ch.rlike(r"^\s"),
                acc.getField("offs"),
            )
            .otherwise(
                F.concat(
                    acc.getField("offs"),
                    F.array(
                        F.struct(
                            acc.getField("off").alias("s"),
                            (acc.getField("off") + F.length(ch)).alias("e"),
                        )
                    ),
                )
            )
            .alias("offs"),
        ),
        lambda acc: acc.getField("offs"),
    )


def _scrub_with_spans(
    docs: DataFrame, span_df: DataFrame, text_col: str, id_col: str
) -> DataFrame:
    spans = (
        span_df.groupBy("doc_id")
        .agg(
            F.collect_list(
                F.struct(
                    F.col("span_start").alias("s"),
                    F.col("span_end").alias("e"),
                )
            ).alias("_spans")
        )
    )
    joined = docs.join(
        spans, docs[id_col] == spans["doc_id"], "left"
    ).drop(spans["doc_id"])
    # Byte-fidelity rebuild from the GAPS BETWEEN spans — O(spans)
    # substring slices of the ORIGINAL text per doc, never a per-token
    # lambda (the per-token exists() form interprets a nested lambda for
    # every token of every document; measured ~8 s at sf0.1 vs <1 s for
    # gap slicing).  Token-index spans map to char ranges through the
    # offsets array; the fold walks the sorted disjoint spans carrying
    # (parts, char cursor): emit original chars [cursor, removed_start),
    # jump the cursor to removed_end, then append the tail slice.
    c = F.col(text_col)
    sp = F.array_sort(
        F.coalesce(
            F.col("_spans"), F.array().cast("array<struct<s:long,e:long>>")
        )
    )
    offs = _token_offsets(text_col)
    n_tok = F.size(offs).cast("long")
    text_len = F.length(c).cast("long")

    def _rm_start(s):
        # span reaching the last token swallows the PRECEDING separator
        # (no following token exists to anchor the usual swallow)
        tail = s.getField("e") >= n_tok
        return (
            F.when(
                ~tail, F.element_at(offs, (s.getField("s") + 1).cast("int"))
                .getField("s")
            )
            .when(
                s.getField("s") > 0,
                F.element_at(offs, s.getField("s").cast("int"))
                .getField("e"),
            )
            .otherwise(F.lit(0).cast("long"))
        )

    def _rm_end(s):
        # through the NEXT token's start — the separator after a
        # removed interior span goes with it, so kept regions join on
        # their original whitespace
        return (
            F.when(
                s.getField("e") < n_tok,
                F.element_at(offs, (s.getField("e") + 1).cast("int"))
                .getField("s"),
            )
            .otherwise(text_len)
        )

    acc0 = F.struct(
        F.array().cast("array<string>").alias("parts"),
        F.lit(0).cast("long").alias("cur"),
    )
    folded = F.aggregate(
        sp,
        acc0,
        lambda acc, s: F.struct(
            F.concat(
                acc.getField("parts"),
                F.array(
                    c.substr(
                        (acc.getField("cur") + 1).cast("int"),
                        (_rm_start(s) - acc.getField("cur")).cast("int"),
                    )
                ),
            ).alias("parts"),
            _rm_end(s).alias("cur"),
        ),
    )
    rebuilt = F.array_join(
        F.concat(
            folded.getField("parts"),
            F.array(
                c.substr(
                    (folded.getField("cur") + 1).cast("int"),
                    (text_len - folded.getField("cur")).cast("int"),
                )
            ),
        ),
        "",
    )
    n_removed = F.aggregate(
        sp,
        F.lit(0).cast("long"),
        lambda acc, s: acc + (s.getField("e") - s.getField("s")),
    )
    out_cols = [col for col in docs.columns if col != text_col]
    return joined.select(
        *out_cols,
        F.when(c.isNull(), F.lit(None).cast("string"))
        .otherwise(rebuilt)
        .alias(text_col),
        n_removed.cast("int").alias("n_removed_tokens"),
    )
