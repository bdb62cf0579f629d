"""Sequence packing: group documents into fixed token-budget training
sequences — the step between a filtered corpus and a pretraining dataloader.

Globally optimal bin packing is inherently sequential, and no production
pipeline runs it that way: corpora are packed SHARD-LOCALLY (each worker
packs its own shard independently), trading a few percent of fill for
embarrassing parallelism.  That is exactly the Spark-friendly shape:

    docs → hash-assign to shard → per-shard greedy best-fit-decreasing
    (applyInPandas, Arrow-batched) → (doc_id, pack_id, n_tokens)

One shuffle (the shard repartition).  Per-task state is one shard's doc
metadata — (doc_id, token_count) pairs only, never text — so a shard of
10 M docs costs ~160 MB of task memory; ``num_shards`` is the dial that
keeps it bounded at any corpus size.  Packing quality: best-fit-
decreasing is within 11/9·OPT + 1 bins of optimal (classic result); the
pytest pins fill-rate ≥ 85% on realistic length mixes.  The in-shard
loop is O(n log n) — open-bin capacities live in a bisect-maintained
sorted list, so a 10 M-doc shard packs in seconds, not hours (first-fit
against a linear bin scan would be O(n²)).

Determinism: shard assignment is a pure hash of doc_id and the in-shard
order is (token_count desc, doc_id) — same inputs, same packs, on any
cluster size.

Oversized documents (token_count > budget) each get a dedicated pack,
flagged ``oversize`` for the caller to truncate/split downstream — a
packer must never silently drop or clip data.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# Local pack ids are offset by shard * _SHARD_STRIDE to form globally
# unique pack ids without any cross-shard coordination.
_SHARD_STRIDE = 1 << 40

OUT_SCHEMA = (
    "doc_id long, pack_id long, n_tokens long, oversize boolean"
)


def bfd_assign(
    token_counts: list[int], budget: int
) -> tuple[list[int], list[bool]]:
    """Best-fit placement over one shard's (pre-sorted) token counts.

    Among open bins that fit, fill the TIGHTEST.  Open bins live in a
    sorted list of (remaining, bin_idx), so each placement is a bisect +
    delete + insert — O(log n) amortized, O(n log n) per shard (a linear
    first-fit bin scan is O(n²): hours, not seconds, at 10 M docs).
    Pass counts sorted descending for the BFD 11/9·OPT+1 guarantee; the
    placement itself is order-agnostic.  Counts above ``budget`` get a
    dedicated, flagged, already-full bin.  Returns (bin index, oversize
    flag) per input position.  Pure function — property-tested directly
    (tests/test_packing_repetition.py) without a Spark session.
    """
    import bisect

    open_bins: list[tuple[int, int]] = []
    n_bins = 0
    assign: list[int] = []
    oversize: list[bool] = []
    for tc in token_counts:
        if tc > budget:
            assign.append(n_bins)  # dedicated, already-full pack
            oversize.append(True)
            n_bins += 1
            continue
        oversize.append(False)
        i = bisect.bisect_left(open_bins, (tc, -1))
        if i < len(open_bins):
            rem, b = open_bins.pop(i)
            assign.append(b)
            if rem > tc:  # still open
                bisect.insort(open_bins, (rem - tc, b))
        else:
            assign.append(n_bins)
            bisect.insort(open_bins, (budget - tc, n_bins))
            n_bins += 1
    return assign, oversize


def pack_documents(
    df: DataFrame,
    token_col: str,
    budget: int,
    doc_id_col: str = "doc_id",
    num_shards: int | None = None,
) -> DataFrame:
    """Assign each document to a training pack of ≤ ``budget`` tokens.

    Returns ``[doc_id, pack_id, n_tokens, oversize]`` — one row per input
    document (docs with null/non-positive token counts are excluded, like
    the postings build's null discipline).
    """
    if budget <= 0:
        raise ValueError("budget must be positive")
    shards = num_shards or df.sparkSession.sparkContext.defaultParallelism

    meta = (
        df.select(
            F.col(doc_id_col).cast("long").alias("doc_id"),
            F.col(token_col).cast("long").alias("n_tokens"),
        )
        .where(F.col("doc_id").isNotNull() & (F.col("n_tokens") > 0))
        .withColumn(
            "shard", F.pmod(F.xxhash64("doc_id"), F.lit(shards))
        )
    )

    # ship the assigner BY VALUE: a bare `bfd_assign` reference inside
    # the worker closure pickles by module+qualname and the executor
    # worker would need `import polars_w_inverted_index_spark` — which
    # fails whenever the driver's cwd is not the repo root (the r8
    # /tmp-contract finding; see functions/pickling.py)
    from ..functions.pickling import by_value

    bfd = by_value(bfd_assign)

    def _pack(pdf: pd.DataFrame) -> pd.DataFrame:
        shard = int(pdf["shard"].iloc[0])
        base = shard * _SHARD_STRIDE
        pdf = pdf.sort_values(
            ["n_tokens", "doc_id"], ascending=[False, True]
        )
        assign, oversize = bfd(
            [int(t) for t in pdf["n_tokens"]], budget
        )
        return pd.DataFrame(
            {
                "doc_id": pdf["doc_id"].to_numpy(),
                "pack_id": [base + a for a in assign],
                "n_tokens": pdf["n_tokens"].to_numpy(),
                "oversize": oversize,
            }
        )

    return meta.groupBy("shard").applyInPandas(_pack, OUT_SCHEMA)


def pack_stats(packed: DataFrame, budget: int) -> DataFrame:
    """Per-corpus packing summary: pack count, mean fill, oversize count.
    One aggregation over the assignment frame — use it to tune
    ``num_shards``/``budget`` before writing the heavy packed output."""
    per_pack = packed.groupBy("pack_id").agg(
        F.sum("n_tokens").alias("pack_tokens"),
        F.max(F.col("oversize").cast("int")).alias("is_oversize"),
    )
    return per_pack.agg(
        F.count("*").alias("n_packs"),
        F.sum("is_oversize").cast("long").alias("n_oversize_packs"),
        F.round(
            F.avg(
                F.when(
                    F.col("is_oversize") == 0,
                    F.col("pack_tokens") / F.lit(float(budget)),
                )
            ),
            6,
        ).alias("mean_fill"),
    )


def materialize_packs(
    docs: DataFrame,
    packed: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    separator: str = "\n\n",
) -> DataFrame:
    """Assemble the physical training shards a dataloader reads:
    ``[pack_id, n_docs, n_tokens, text]`` — each pack's documents
    concatenated in ascending doc_id order (deterministic, so re-runs
    byte-match), ``separator``-joined.

    The last-mile step after :func:`pack_documents` (which moves only
    (doc_id, token_count) metadata): the text itself is shuffled exactly
    once, here, keyed by pack_id.  Per-group state is one pack's text —
    bounded by the packing budget by construction (oversize singleton
    docs are their own pack), so no executor assembles more than
    ~budget tokens regardless of corpus size.
    """
    from pyspark.sql import functions as F

    joined = docs.select(
        F.col(id_col).alias("_id"), F.col(text_col).alias("_text")
    ).join(
        packed.select(
            F.col("doc_id").alias("_id"), "pack_id", "n_tokens"
        ),
        "_id",
    )
    return (
        joined.groupBy("pack_id")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_tokens").alias("n_tokens"),
            F.array_join(
                F.transform(
                    F.array_sort(
                        F.collect_list(F.struct("_id", "_text"))
                    ),
                    lambda s: s.getField("_text"),
                ),
                separator,
            ).alias("text"),
        )
    )
