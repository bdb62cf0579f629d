"""End-to-end training-corpus preparation: the operators composed.

``prepare_training_corpus`` chains the hygiene and assembly stages a
pretraining data pipeline runs, in the order that minimizes work:

    scrub (narrow) → quality + repetition gates (narrow, pushed early)
    → exact dedup (1 shuffle on content hash)
    → optional near-dedup (LSH band join → connected components)
    → stratified language mix (narrow)
    → train/val/test split (narrow, pure doc_id hash)
    → sequence packing of the train split (1 shuffle)

Narrow stages run before the dedup shuffle so the shuffle sees only
surviving rows — the same filter-before-shuffle property the
``pipeline_quality_dedup`` registry row pins for its smaller
composition.  Everything after dedup is a pure function of
(doc_id, seed): re-running on re-sharded input reproduces the same
splits, samples, and packs, which is the reproducibility bar for
ablation studies.

This module is deliberately thin: every stage is an operator with its
own tests; what is tested HERE (tests/test_pipeline_e2e.py) is the
composition contract — no row leaks between stages, split disjointness,
gate monotonicity, pack integrity — at sf0.001.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .functions.scrub import scrub_documents
from .functions.text import repetition_profile_df, token_count
from .operators.dedup import (
    dedup_clusters,
    drop_near_duplicates,
    exact_dedup,
    minhash_lsh_pairs,
)
from .operators.packing import pack_documents
from .operators.sampling import stratified_sample


@dataclass
class CorpusConfig:
    """Gate thresholds + mixing fractions, defaults tuned to the test
    corpus (documents.parquet) but every knob is per-deployment."""

    min_tokens: int = 5
    max_dup_3gram_frac: float = 0.5
    max_redaction_frac: float = 0.1  # redactions per token
    # Near-dedup (MinHash-LSH pairs → connected components → keep the
    # canonical member).  Opt-in: cluster resolution is iterative and
    # runs Spark actions eagerly, unlike every other (lazy) stage.
    near_dedup: bool = False
    near_dedup_min_bands: int = 1  # pairs need ≥ this many shared bands
    # Model-based quality gate (operators/quality_model.py): when set,
    # a hashed-LR classifier is trained on the heuristic gates' weak
    # labels and rows scoring below the threshold are dropped (score
    # kept for audit).  Opt-in: training fits eagerly, like near_dedup.
    quality_model_threshold: float | None = None
    # Line-level boilerplate removal (operators/line_dedup.py): strip
    # lines appearing in more than this many documents BEFORE scrubbing
    # and profiling (boilerplate would otherwise pollute token counts
    # and repetition signals).  None = off.
    max_line_df: int | None = None
    # Verbatim-span scrubbing (operators/span_dedup.py): remove k-token
    # passages repeated >= span_scrub_min_count times corpus-wide.
    # Runs on RAW text, before PII scrubbing — redaction placeholders
    # are themselves verbatim-identical and would otherwise register as
    # hot windows.  None = off.
    span_scrub_k: int | None = None
    span_scrub_min_count: int = 2
    lang_fractions: dict[str, float] = field(
        default_factory=lambda: {"en": 1.0, "de": 1.0, "fr": 1.0, "es": 1.0}
    )
    split_salt: str = "corpus-v1"
    pack_budget: int = 2048
    # Context-window chunking of the train split before packing (None =
    # pack whole documents).  stride < window ⇒ overlapping windows.
    chunk_window: int | None = None
    chunk_stride: int | None = None
    seed: int = 0


def prepare_training_corpus(
    docs: DataFrame,
    config: CorpusConfig | None = None,
    text_col: str = "text",
    lang_col: str = "lang",
) -> dict[str, DataFrame]:
    """Returns ``{"corpus", "train", "val", "test", "packs"}`` — all lazy.

    ``corpus`` is the cleaned/deduped/mixed corpus with per-doc quality
    columns retained for audit; the splits partition it; ``packs`` is the
    pack assignment for the train split.
    """
    cfg = config or CorpusConfig()

    if cfg.max_line_df is not None:
        from .operators.line_dedup import remove_boilerplate_lines

        docs = remove_boilerplate_lines(
            docs, cfg.max_line_df, text_col=text_col
        )
    if cfg.span_scrub_k is not None:
        from .operators.span_dedup import scrub_repeated_spans

        docs = scrub_repeated_spans(
            docs,
            k=cfg.span_scrub_k,
            min_count=cfg.span_scrub_min_count,
            text_col=text_col,
        )  # n_removed_tokens rides along as an audit column
    scrubbed = scrub_documents(docs, text_col=text_col)
    profiled = repetition_profile_df(
        scrubbed.withColumn("n_tokens_ws", token_count(text_col)),
        text_col=text_col,
    )
    gated = profiled.where(
        (F.col("n_tokens_ws") >= cfg.min_tokens)
        & (F.col("dup_3gram_frac") <= cfg.max_dup_3gram_frac)
        & (
            F.col("n_redactions")
            <= cfg.max_redaction_frac * F.col("n_tokens_ws")
        )
    )
    if cfg.quality_model_threshold is not None:
        # Learned gate after the heuristic gates: the model is trained
        # on the SCRUBBED corpus with the heuristics as weak labels, so
        # it generalizes the same prior to rows the heuristics misjudge;
        # surviving rows carry quality_score for audit.
        from .operators.quality_model import (
            quality_filter,
            train_quality_model,
            weak_quality_labels,
        )

        model = train_quality_model(
            weak_quality_labels(scrubbed, text_col=text_col),
            text_col=text_col,
        )
        gated = quality_filter(
            model, gated, cfg.quality_model_threshold, text_col=text_col
        )
    deduped = exact_dedup(gated, text_col=text_col)
    if cfg.near_dedup:
        # Exact dedup first so identical copies never reach the (more
        # expensive) shingle/banding stage; clusters then collapse the
        # remaining near-identical variants onto their min-id canonical.
        pairs = minhash_lsh_pairs(deduped, text_col=text_col).where(
            F.col("n_shared_bands") >= cfg.near_dedup_min_bands
        )
        deduped = drop_near_duplicates(deduped, dedup_clusters(pairs))
    corpus = stratified_sample(
        deduped, lang_col, cfg.lang_fractions, seed=cfg.seed
    )

    # Pure-hash split, same discipline as the pipeline_train_val_split
    # registry row: leak-free under re-shards and appends.
    from .functions.hashing import md5_long

    h = F.pmod(
        md5_long(
            F.concat(
                F.lit(cfg.split_salt + ":"), F.col("doc_id").cast("string")
            )
        ),
        F.lit(100),
    )
    corpus = corpus.withColumn(
        "split",
        F.when(h < 80, "train").when(h < 90, "val").otherwise("test"),
    )

    train = corpus.where(F.col("split") == "train")
    if cfg.chunk_window is not None:
        # Chunk → pack: the packer sees context-window units instead of
        # whole documents.  chunk_uid = (doc_id << 20) | chunk_idx is
        # deterministic and collision-free below 2^20 chunks per doc
        # (a 10^8-token document at the default stride — beyond any
        # realistic input; the guard makes the bound loud, not silent).
        from .operators.chunking import chunk_documents

        chunks = chunk_documents(
            train,
            window=cfg.chunk_window,
            stride=cfg.chunk_stride or cfg.chunk_window,
            text_col=text_col,
        ).withColumn(
            "chunk_uid",
            F.when(
                F.col("chunk_idx") < F.lit(1 << 20),
                F.shiftleft(F.col("doc_id"), 20)
                + F.col("chunk_idx").cast("long"),
            ),
        )
        packs = pack_documents(
            chunks, "n_tokens", cfg.pack_budget,
            doc_id_col="chunk_uid", num_shards=None,
        ).withColumnRenamed("doc_id", "chunk_uid")
    else:
        chunks = None
        packs = pack_documents(
            train, "n_tokens_ws", cfg.pack_budget, num_shards=None
        )
    out = {
        "corpus": corpus,
        "train": train,
        "val": corpus.where(F.col("split") == "val"),
        "test": corpus.where(F.col("split") == "test"),
        "packs": packs,
    }
    if chunks is not None:
        out["chunks"] = chunks
    return out
