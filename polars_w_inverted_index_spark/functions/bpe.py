"""BPE tokenizer induction from a corpus, Spark-first.

A training-data pipeline doesn't just consume a tokenizer — it *builds*
one from the corpus (vocabulary induction is a standard pre-training
step).  Classic byte-pair encoding (Sennrich et al. 2016) trains on the
corpus **word-frequency table**, and that is the whole scale story here:

- ONE corpus-wide pass (`word_counts`: explode whitespace tokens,
  groupBy word) reduces 100 TB of text to a Zipf-bounded vocabulary
  table — millions of rows, not billions;
- every training round then works on that vocabulary table only:
  adjacent-pair counts weighted by word frequency (shuffle keys =
  symbol pairs, vocabulary-bounded), a 1-row argmax collect, and a
  JVM-side fold applying the merge to each word's symbol array.
  Per-round cost is independent of corpus size.

The driver holds O(1) state per round (the winning pair) — the same
iterative-algorithm shape as dedup cluster label propagation, with
``localCheckpoint`` truncating lineage each round (the merge fold nests
one expression layer per round otherwise, and codegen dies around ~60
nested layers long before correctness does).

Merge application at *scoring* time (`bpe_encode`) is the one justified
Python path: ranked-merge application is an inherently sequential
per-word loop (each merge depends on the previous one's output), so it
runs as an Arrow-batched ``mapInPandas`` with a per-batch word memo —
each distinct word is encoded once per batch regardless of how many
times it appears.  Everything else is built-in expressions.

End-of-word discipline: the final character of each word carries a
``</w>`` suffix (the Sennrich convention), so token sequences
concatenate back to the exact word and a mid-word "st" is a different
symbol from a word-final "st</w>".
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .text import tokens

EOW = "</w>"


def word_counts(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """``[word, wc]`` — the corpus reduced to its word-frequency table.

    The one corpus-wide pass of BPE training; everything after is
    vocabulary-sized.  Uses the same lowercase-whitespace tokenization
    as the rest of the text stack (functions/text.tokens).
    """
    return (
        docs.select(F.explode(tokens(text_col)).alias("word"))
        .groupBy("word")
        .agg(F.count("*").alias("wc"))
    )


def _initial_symbols() -> F.Column:
    """Split ``word`` into characters, ``</w>``-marking the last one."""
    chars = F.split(F.col("word"), "")
    n = F.size(chars)
    return F.transform(
        chars,
        lambda x, i: F.when(i == n - 1, F.concat(x, F.lit(EOW))).otherwise(x),
    )


def _pair_counts(wf: DataFrame) -> DataFrame:
    """``[a, b, cnt]`` — adjacent symbol pairs weighted by word count."""
    sym = F.col("sym")
    pairs = F.transform(
        F.slice(sym, 1, F.size(sym) - 1),
        lambda x, i: F.struct(
            x.alias("a"), F.element_at(sym, i + 2).alias("b")
        ),
    )
    return (
        wf.where(F.size("sym") >= 2)
        .select(F.explode(pairs).alias("p"), "wc")
        .groupBy("p.a", "p.b")
        .agg(F.sum("wc").alias("cnt"))
    )


def _apply_merge(a: str, b: str) -> F.Column:
    """Left-to-right greedy replacement of adjacent (a, b) with a+b —
    a single JVM-side fold over the symbol array.  Overlap semantics
    match the reference scan-with-skip: ``a a a`` under merge (a, a)
    yields ``aa a`` (a just-merged symbol is not immediately re-merged
    with the next element unless it itself equals ``a``... which for
    self-merges it never does, since ``aa != a``)."""
    ab = a + b

    def step(acc, x):
        can_merge = (F.size(acc) > 0) & (
            F.element_at(acc, -1) == F.lit(a)
        ) & (x == F.lit(b))
        return F.when(
            can_merge,
            F.concat(
                F.slice(acc, 1, F.size(acc) - 1), F.array(F.lit(ab))
            ),
        ).otherwise(F.concat(acc, F.array(x)))

    return F.aggregate(
        F.col("sym"),
        F.array().cast("array<string>"),
        step,
    )


def _train_inmemory(
    items: list[tuple[str, int]], n_merges: int, min_frequency: int
) -> list[tuple[str, str]]:
    """Sequential BPE over a collected word-frequency table, with
    incremental pair-count maintenance (only words containing the
    winning pair are re-derived each round — the standard fast-trainer
    shape).  Bit-identical to the distributed loop by construction: the
    same argmax rule (max weighted count, then lexicographically
    smallest (a, b)), the same left-to-right greedy merge application
    as :func:`_apply_merge`'s fold, the same occurrence-weighted pair
    counts as :func:`_pair_counts`."""
    from collections import defaultdict

    syms: list[list[str]] = []
    wcs: list[int] = []
    for word, wc in items:
        s = list(word)
        if s:
            s[-1] = s[-1] + EOW
        syms.append(s)
        wcs.append(int(wc))

    pair_cnt: dict[tuple[str, str], int] = defaultdict(int)
    pair_words: dict[tuple[str, str], set[int]] = defaultdict(set)
    for wi, s in enumerate(syms):
        for p in zip(s, s[1:]):
            pair_cnt[p] += wcs[wi]
            pair_words[p].add(wi)

    def _apply(seq: list[str], a: str, b: str) -> list[str]:
        # mirror of _apply_merge's fold: greedy left-to-right, the
        # just-merged symbol never immediately re-merges (ab != a)
        out: list[str] = []
        for x in seq:
            if out and out[-1] == a and x == b:
                out[-1] = a + b
            else:
                out.append(x)
        return out

    merges: list[tuple[str, str]] = []
    for _ in range(n_merges):
        if not pair_cnt:
            break
        (a, b), cnt = min(
            pair_cnt.items(), key=lambda kv: (-kv[1], kv[0])
        )
        if cnt < min_frequency:
            break
        merges.append((a, b))
        # touch only the words that (may) contain the winning pair;
        # stale pair_words entries are harmless (dec+inc nets zero)
        for wi in list(pair_words[(a, b)]):
            old = syms[wi]
            new = _apply(old, a, b)
            if new == old:
                continue
            wc = wcs[wi]
            for p in zip(old, old[1:]):
                pair_cnt[p] -= wc
                if pair_cnt[p] <= 0:
                    del pair_cnt[p]
            syms[wi] = new
            for p in zip(new, new[1:]):
                pair_cnt[p] += wc
                pair_words[p].add(wi)
    return merges


def bpe_train(
    docs: DataFrame,
    n_merges: int = 50,
    text_col: str = "text",
    min_frequency: int = 2,
    word_counts_df: DataFrame | None = None,
    max_driver_vocab: int = 1_000_000,
) -> list[tuple[str, str]]:
    """Learn up to ``n_merges`` BPE merges; returns them in rank order.

    Determinism: the winning pair each round is (max weighted count,
    then lexicographically smallest (a, b)) — no RNG, identical across
    engines and runs.  Training stops early when no pair reaches
    ``min_frequency``.  ``word_counts_df`` lets a standing corpus reuse
    its materialized word-frequency table (the corpus-pass artifact).

    Execution: the corpus pass (:func:`word_counts`) is always Spark —
    that is the 100 TB work.  Training then runs on the Zipf-bounded
    frequency table; when it has ≤ ``max_driver_vocab`` distinct words
    it is collected and trained in-memory (:func:`_train_inmemory`) —
    identical output, and the 1-Spark-job-per-merge scheduler round-trip
    (50 merges = 50 jobs) disappears.  Larger vocabularies fall back to
    the distributed per-round loop below (per-round work stays
    vocabulary-sized either way).
    """
    wf = (
        word_counts_df
        if word_counts_df is not None
        else word_counts(docs, text_col)
    )
    small = wf.limit(max_driver_vocab + 1).collect()
    if len(small) <= max_driver_vocab:
        return _train_inmemory(
            [(r["word"], r["wc"]) for r in small], n_merges, min_frequency
        )
    wf = wf.select("word", "wc", _initial_symbols().alias("sym"))
    wf = wf.localCheckpoint(eager=True)
    merges: list[tuple[str, str]] = []
    for _ in range(n_merges):
        top = (
            _pair_counts(wf)
            .orderBy(
                F.col("cnt").desc(), F.col("a").asc(), F.col("b").asc()
            )
            .limit(1)
            .collect()
        )
        if not top or top[0]["cnt"] < min_frequency:
            break
        a, b = top[0]["a"], top[0]["b"]
        merges.append((a, b))
        # lineage truncation per round: the fold would otherwise nest one
        # expression layer per merge over the same column
        wf = wf.select(
            "word", "wc", _apply_merge(a, b).alias("sym")
        ).localCheckpoint(eager=True)
    return merges


def bpe_vocab(merges: list[tuple[str, str]]) -> list[str]:
    """Merge-produced symbols in rank order (the learned vocabulary
    beyond the base characters)."""
    return [a + b for a, b in merges]


def save_merges(spark, merges: list[tuple[str, str]], path: str) -> str:
    """Persist learned merges as a parquet artifact ``[rank, a, b]`` —
    the tokenizer IS this table (plus the base characters); any engine
    that can read parquet can reproduce the encoding."""
    df = spark.createDataFrame(
        [(i, a, b) for i, (a, b) in enumerate(merges)],
        "rank int, a string, b string",
    )
    df.coalesce(1).write.mode("overwrite").parquet(path)
    return path


def load_merges(spark, path: str) -> list[tuple[str, str]]:
    """Inverse of :func:`save_merges` (rank order restored)."""
    rows = spark.read.parquet(path).orderBy("rank").collect()
    return [(r["a"], r["b"]) for r in rows]


def bpe_encode(
    docs: DataFrame,
    merges: list[tuple[str, str]],
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """``[<id_col>, bpe_tokens array<string>, n_bpe_tokens int]`` —
    encode each document with the learned merges.

    Arrow-batched ``mapInPandas`` — measured and KEPT (r11,
    tools/string_bridge_bench.py): the encode kernel needs a Python str
    per document regardless of bridge (``.lower().split()`` + the
    per-word merge loop), and the pandas object Series materializes
    them cheaper than ``to_pylist()`` on the Arrow column — 0.51 s vs
    0.64 s at 300k docs.  The vector family's ~2 s/M-row bridge tax was
    per-row numpy ARRAY objects; it does not transfer to string
    batches (identity pass: 0.825 vs 0.634 s at 10 M rows — ~19 ms/M).

    The per-batch word memo means each distinct word is encoded once
    per batch (Zipf makes that a large saving), and ranked merges apply
    via the standard lowest-rank-first loop.  Mirrors the training fold
    exactly: a word that appeared in training encodes to the same
    symbols `bpe_train` left it with.
    """
    ranks = {pair: i for i, pair in enumerate(merges)}

    def _encode_word(word: str, memo: dict) -> list[str]:
        got = memo.get(word)
        if got is not None:
            return got
        syms = list(word)
        if syms:
            syms[-1] = syms[-1] + EOW
        while len(syms) >= 2:
            best_rank = None
            best_i = -1
            for i in range(len(syms) - 1):
                r = ranks.get((syms[i], syms[i + 1]))
                if r is not None and (best_rank is None or r < best_rank):
                    best_rank, best_i = r, i
            if best_rank is None:
                break
            syms[best_i : best_i + 2] = [syms[best_i] + syms[best_i + 1]]
        memo[word] = syms
        return syms

    def _run(it):
        import pandas as pd

        memo: dict = {}
        for pdf in it:
            out_ids, out_toks = [], []
            for did, text in zip(pdf["_id"], pdf["_txt"]):
                words = (text or "").lower().split()
                toks: list[str] = []
                for w in words:
                    toks.extend(_encode_word(w, memo))
                out_ids.append(did)
                out_toks.append(toks)
            yield pd.DataFrame({"_id": out_ids, "bpe_tokens": out_toks})

    from pyspark.sql.types import ArrayType, StringType, StructField, StructType

    # the id passes through mapInPandas untouched, so the output schema
    # must carry its REAL type — hardcoding 'long' corrupts/fails string
    # or int ids at Arrow conversion
    out_schema = StructType(
        [
            StructField("_id", docs.schema[id_col].dataType),
            StructField("bpe_tokens", ArrayType(StringType())),
        ]
    )
    enc = docs.select(
        F.col(id_col).alias("_id"), F.col(text_col).alias("_txt")
    ).mapInPandas(_run, out_schema)
    return enc.select(
        F.col("_id").alias(id_col),
        "bpe_tokens",
        F.size("bpe_tokens").alias("n_bpe_tokens"),
    )
