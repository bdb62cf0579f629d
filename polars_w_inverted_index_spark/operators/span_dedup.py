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
2. ``count(*) over (partition by sh)`` marks hot windows in place —
   uniform high-cardinality keys, the corpus's ONE sh-keyed shuffle
   (a groupBy + semi-join back would materialize the window frame
   twice: a second full corpus scan);
3. windows with ``count >= min_count`` mark their [pos, pos+k) token
   interval; per document the intervals merge into maximal spans
   (row-based gaps-and-islands: gap flag + running sum + groupBy —
   linear per-doc work on the one doc_id-keyed shuffle);
4. scrubbing rebuilds the text at byte fidelity from the whitespace-run
   chunks outside every span — token↔chunk indices are affine
   (alternating runs: token t is chunk c0 + 2t), so span resolution is
   arithmetic inside the rebuild scan and the whole pipeline reads the
   corpus text exactly TWICE (detect, rebuild).

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
    from ..plans.distribution import ensure_parallelism

    # r14 (guide §2.5 input skew): tokenize + per-window hashing is the
    # CPU-heavy stage and starts in the SCAN stage — fan a
    # single-partition scan out first (no-op at scale)
    docs = ensure_parallelism(
        docs.select(F.col(id_col), F.col(text_col))
    )
    tok = tokens(text_col)
    if portable:
        # One arrays_zip of the k shifted copies + one fused
        # concat+hash transform (the word_ngrams construction), NOT
        # ``transform(positions, i -> slice(tok, i, k))``: Spark does no
        # CSE inside higher-order lambdas, so the positional form
        # re-tokenizes the whole document once per window — O(tokens²)
        # per doc, the same quadratic killed in the default path's
        # tail guard.  And not a chain of k-1 zip_with passes: each
        # higher-order pass is interpreted while arrays_zip/slice are
        # codegen, so one fused lambda pays the interpreter once.
        shifts = [tok] + [
            F.slice(tok, j + 1, F.greatest(F.size(tok) - j, F.lit(0)))
            for j in range(1, k)
        ]
        # unnamed expression inputs → positional field names "0".."k-1"
        grams = F.slice(
            F.arrays_zip(*shifts),
            1,
            F.greatest(F.size(tok) - (k - 1), F.lit(0)),
        )
        wins = F.transform(
            grams,
            lambda s, i: F.struct(
                i.alias("pos"),
                md5_long(
                    F.concat_ws(
                        "\x1f", *[s[str(j)] for j in range(k)]
                    )
                ).alias("sh"),
            ),
        )
        return (
            docs.where(F.size(tok) >= k)
            .select(
                F.col(id_col).alias("doc_id"), F.explode(wins).alias("g")
            )
            .select("doc_id", "g.pos", "g.sh")
        )
    from pyspark.sql import Window

    base = (
        docs.where(F.size(tok) >= k)
        .select(
            F.col(id_col).alias("doc_id"),
            F.posexplode(tok).alias("pos", "_t"),
        )
        .withColumn("_h", F.xxhash64("_t"))
    )
    w = Window.partitionBy("doc_id").orderBy("pos")
    parts = [F.col("_h")] + [
        F.lead("_h", j).over(w) for j in range(1, k)
    ]
    # Tail-position guard: xxhash64 SKIPS null args, so an unguarded tail
    # window would hash like a shorter gram and alias other keys.  The
    # guard is "the furthest lead is non-null" (token hashes are never
    # null), NOT a token-count comparison: a ``size(tokens(text))``
    # column here gets collapsed by Catalyst into the post-Generate
    # projection, re-tokenizing the WHOLE document once per exploded row
    # — O(tokens²) per doc, measured 4× super-linear growth on a single
    # long document (r7; the lead-null form is flat-linear).
    last = parts[-1]
    return (
        base.select(
            "doc_id",
            "pos",
            F.xxhash64(*parts).alias("sh"),
            last.isNotNull().alias("_full"),
        )
        .where(F.col("_full"))
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
    within-document repeats).

    Hot marking is ``count(*) over (partition by sh)`` + filter, NOT a
    ``groupBy`` + semi-join back: the semi-join form references the
    window frame twice, and with the hot set past broadcast size (at
    corpus scale it is) both references are materialized independently
    — a SECOND full corpus scan + tokenize + hash pass.  The window
    form shuffles the window rows on ``sh`` exactly once (the same
    exchange the semi-join's shuffled build would pay) and keeps each
    row's count with it.  Skew note: WindowExec buffers one ``sh``
    group at a time in a spillable array, so a mega-hot window (one
    boilerplate passage repeated 10^8 times corpus-wide) degrades to
    disk-backed buffering of that one group, not OOM — and the groupBy
    alternative's shuffled semi-join buffers the same hot key on the
    build side anyway."""
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    from pyspark.sql import Window

    win = _window_rows(docs, k, text_col, id_col)
    marked = (
        win.withColumn(
            "_n", F.count("*").over(Window.partitionBy("sh"))
        )
        .where(F.col("_n") >= min_count)
        .select("doc_id", "pos")
    )
    return _merge_marked_to_spans(marked, k)


def _merge_marked_to_spans(marked: DataFrame, k: int) -> DataFrame:
    """``[doc_id, span_start, span_end]`` — merge hot-window [pos,
    pos+k) intervals per doc, ROW-BASED and linear: because every
    interval has the same length k, ends are monotone in sorted starts,
    so a new maximal span begins exactly where a gap ``pos > lag(pos)+k``
    appears; a running sum of those new-span flags numbers the spans and
    one groupBy folds each to (min start, max pos + k).  Same single
    doc_id-keyed shuffle as the previous array-fold form, but O(windows)
    work instead of the fold's O(spans²) array copies on documents with
    many disjoint spans (r6 VERDICT finding #2)."""
    from pyspark.sql import Window

    w = Window.partitionBy("doc_id").orderBy("pos")
    prev = F.lag("pos").over(w)
    new_span = F.when(
        prev.isNull() | (F.col("pos") > prev + k), F.lit(1)
    ).otherwise(F.lit(0))
    grouped = marked.select(
        "doc_id",
        "pos",
        F.sum(new_span)
        .over(w.rowsBetween(Window.unboundedPreceding, 0))
        .alias("_grp"),
    )
    return grouped.groupBy("doc_id", "_grp").agg(
        F.min("pos").cast("long").alias("span_start"),
        (F.max("pos") + k).cast("long").alias("span_end"),
    ).drop("_grp")


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
    inner form broadcasts the small batch side and the batch-only-hot
    windows come back via a cheap union.  The batch side is broadcast
    EXPLICITLY, not left to AQE: when the static planner's (rough)
    estimate of the batch-count aggregation exceeds the broadcast
    threshold it plans a sort-merge join, whose corpus-side shuffle has
    already been materialized by the time runtime stats let AQE convert
    the join — the corpus-sized shuffle this operator exists to avoid
    would be paid anyway (observed in the skew-guard test pre-fix).
    Batch windows are bounded by the ingest trigger, so the broadcast
    is O(batch) by the operator's own contract.
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
        F.broadcast(batch_counts).join(
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


_CHUNK_SPLIT = r"(?<=\s)(?=\S)|(?<=\S)(?=\s)"


def _scrub_with_spans(
    docs: DataFrame, span_df: DataFrame, text_col: str, id_col: str
) -> DataFrame:
    # Byte-fidelity rebuild from the GAPS BETWEEN spans — pure array
    # slicing of the per-doc chunk array, never a per-token lambda (the
    # per-token exists() form interprets a nested lambda for every token
    # of every document; measured ~8 s at sf0.1 vs <1 s for gap
    # slicing), never a char-offset substring (Spark's UTF-8 substr
    # seeks from the string start — O(spans·chars) per doc), never an
    # array-accumulator fold or map lookup (O(spans²) each; a
    # boilerplate-dense document carries O(tokens/k) disjoint spans).
    #
    # Token-index spans resolve to chunk-index removal ranges by PURE
    # ARITHMETIC inside this one scan — no extra corpus pass.  The
    # chunk runs strictly alternate whitespace/non-whitespace (maximal
    # runs split at zero-width transitions), so token ``t`` lives at
    # chunk ``c0 + 2t`` where ``c0`` = 1 iff the text opens with
    # whitespace, and the token count is ``floor((n_chunks-c0+1)/2)``
    # — the r7 row-level join resolution (re-exploding every spanned
    # document's runs: one more full text scan, a row_number sort and
    # a join) computed exactly this affine map the hard way.  Removal
    # semantics (see scrub_repeated_spans): a non-tail span [s, e)
    # removes chunks [c0+2s, c0+2e) — its tokens, inner separators and
    # the separator BEFORE token e; a tail span (e == n_tok) swallows
    # its PRECEDING separator instead, removing [c0+2s-1, n_chunks)
    # (from chunk 0 when s == 0: a whole-document span scrubs to "").
    #
    # Part j is array_join(slice(chunks, ...)) between span j's removal
    # end and span j+1's removal start — O(gap) work per gap, O(chunks)
    # total.  ``_chunks`` / ``_spans`` / ``_c0`` / ``_n_tok`` are
    # materialized columns (non-cheap + multiply referenced, so
    # CollapseProject keeps the Project boundary — the
    # repetition_profile_df discipline): the lambdas index ATTRIBUTES,
    # re-deriving nothing per element.
    from ..functions.text import free_col_name
    from ..plans.distribution import ensure_parallelism

    # r14 (guide §2.5): the chunk split + gap slicing is per-row
    # CPU-heavy and otherwise runs in the single-partition scan stage;
    # fan the docs side out first (no-op at scale).  Rebound BEFORE any
    # attribute reference so the join condition binds to this frame.
    docs = ensure_parallelism(docs)
    # internal column names picked collision-free so a caller's own
    # '_spans'/'_chunks'/... columns survive (the free_col_name
    # discipline, ADVICE r7)
    spans_c = free_col_name(docs, "_spans")
    did_c = free_col_name(docs, "_did")
    chunks_c = free_col_name(docs, "_chunks")
    c0_c = free_col_name(docs, "_c0")
    ntok_c = free_col_name(docs, "_n_tok")
    spans = (
        span_df.groupBy("doc_id")
        .agg(
            F.array_sort(
                F.collect_list(
                    F.struct(
                        F.col("span_start").cast("long").alias("s"),
                        F.col("span_end").cast("long").alias("e"),
                    )
                )
            ).alias(spans_c)
        )
        .withColumnRenamed("doc_id", did_c)
    )
    c = F.col(text_col)
    joined = (
        docs.join(spans, docs[id_col] == spans[did_c], "left")
        .drop(did_c)
        .withColumn(chunks_c, F.split(c, _CHUNK_SPLIT))
    )
    ch = F.col(chunks_c)
    first = F.element_at(ch, 1)
    joined = joined.withColumn(
        c0_c,
        F.when(
            (F.length(first) > 0) & ~first.rlike(r"^\s"), F.lit(0)
        )
        .otherwise(F.lit(1))
        .cast("long"),
    )
    n_chunks = F.size(ch).cast("long")
    joined = joined.withColumn(
        ntok_c, F.floor((n_chunks - F.col(c0_c) + 1) / F.lit(2))
    )
    sp = F.col(spans_c)  # sorted at build; attribute = cheap per access
    n_sp = F.coalesce(F.size(sp), F.lit(0))
    c0, n_tok = F.col(c0_c), F.col(ntok_c)

    def _rm_start(span):
        # first removed chunk of a span struct (affine map above)
        s, e = span.getField("s"), span.getField("e")
        return F.when(e < n_tok, c0 + 2 * s).otherwise(
            F.greatest(c0 + 2 * s - 1, F.lit(0).cast("long"))
        )

    def _rm_end(span):
        s, e = span.getField("s"), span.getField("e")
        return F.when(e < n_tok, c0 + 2 * e).otherwise(n_chunks)

    def _gap_start(j):
        # removal end of the span BEFORE gap j; gap 0 starts at chunk 0
        return F.when(j == 0, F.lit(0).cast("long")).otherwise(
            _rm_end(F.element_at(sp, j.cast("int")))
        )

    def _gap_end(j):
        # removal start of the span AFTER gap j; the last gap runs to
        # the end of the chunk array
        return F.when(j == n_sp, n_chunks).otherwise(
            _rm_start(F.element_at(sp, (j + 1).cast("int")))
        )

    parts = F.transform(
        F.sequence(F.lit(0), n_sp),  # n_spans + 1 gaps
        lambda j: F.array_join(
            F.slice(
                ch,
                (_gap_start(j) + 1).cast("int"),
                (_gap_end(j) - _gap_start(j)).cast("int"),
            ),
            "",
        ),
    )
    rebuilt = F.array_join(parts, "")
    n_removed = F.aggregate(
        F.coalesce(
            sp, F.array().cast("array<struct<s:long,e:long>>")
        ),
        F.lit(0).cast("long"),
        lambda acc, s: acc + s.getField("e") - s.getField("s"),
    )
    out_cols = [col for col in docs.columns if col != text_col]
    return joined.select(
        *out_cols,
        F.when(c.isNull(), F.lit(None).cast("string"))
        .otherwise(rebuilt)
        .alias(text_col),
        n_removed.cast("int").alias("n_removed_tokens"),
    )
