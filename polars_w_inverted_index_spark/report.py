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
    # one tokenize per document, shared by every token-consuming signal:
    # the materialized array is non-cheap and multiply referenced, so
    # CollapseProject keeps the Project boundary (the
    # repetition_profile_df discipline) — without it each signal's
    # textual tokens() reference re-splits the text (~8× per row with
    # the 4-language lang-id)
    from .functions.text import free_col_name, tokens

    from .plans.distribution import ensure_parallelism

    tcol = free_col_name(docs, "_toks")  # don't clobber a caller's _toks
    # r14 (guide §2.5): tokenize + metric expressions are per-row CPU
    # work in the scan stage — fan a single-partition scan out first
    # (no-op at scale)
    toked = ensure_parallelism(docs).withColumn(tcol, tokens(text_col))
    tok = F.col(tcol)
    n_chars, n_tokens, punct_ratio, stop_ratio, mean_tok = quality_metrics(
        text_col, tok=tok
    )
    lang = F.col(lang_col) if lang_col else lang_id(text_col, tok=tok)
    base = toked.select(
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


def embedding_dedup_eval_report(
    embeddings: DataFrame,
    threshold: float = 0.2,
    n_planes: int = 16,
    prefix_bits: int = 4,
    topk: int = 5,
    n_query_vecs: int = 10,
    n_centroids: int = 16,
    nprobe: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    max_vecs: int = 5_000,
    pq_m: int = 8,
    pq_codes: int = 16,
    pq_rerank_factors: tuple[int, ...] = (2, 4, 8),
) -> DataFrame:
    """``[section='embedding_dedup_eval', metric, value_num,
    value_str]`` — measured recall/precision of the EMBEDDING-space
    approximate paths against their brute-force cosine twins (VERDICT
    r7 task 7; completes :func:`dedup_eval_report`, which covers the
    text-shingle paths):

    - ``semantic_dedup``'s candidate generator
      (dedup.embedding_cosine_pairs_gemm: LSH-prefix buckets + exact
      within-bucket cosine) vs ALL pairs with cosine >= threshold —
      recall quantifies what prefix bucketing misses (near-dup pairs
      split across buckets), precision SHOULD be 1.0 (exact cosine at
      the same threshold and rounding inside each bucket) and is
      measured, not assumed;
    - IVF-served top-k retrieval (similarity.ivf_topk at these
      centroid/nprobe dials) vs brute-force exact top-k — neighbor-set
      recall@k averaged over the query set, the number that tells you
      whether nprobe is high enough for the corpus's cluster shape.
    - PQ recall at REALISTIC rerank factors (r8 VERDICT task 7: the
      driver row only pins the full-coverage identity): for each
      ``pq_rerank_factors`` entry, ADC over (``pq_m``, ``pq_codes``)
      codes proposes ``k·factor`` candidates and exact re-rank keeps
      top-k — the recall-vs-candidate-width dial a deployment actually
      tunes (factor == |corpus|/k degenerates to brute force; these
      rows show what factor 2/4/8 trade away on THIS corpus).

    SAMPLED-CORPUS diagnostic like its text twin: pair truth is
    O(n²/2), so corpora past ``max_vecs`` fail loudly — sample
    upstream."""
    from .operators.dedup import embedding_cosine_pairs_gemm
    from .operators.similarity import brute_force_topk, ivf_topk

    n = embeddings.count()
    if n > max_vecs:
        raise ValueError(
            f"embedding_dedup_eval_report is a sampled-corpus "
            f"diagnostic: corpus has {n} vectors > max_vecs={max_vecs}; "
            "exact pair truth is O(n^2/2) - sample upstream and "
            "evaluate the sample (or raise max_vecs deliberately)."
        )
    spark = embeddings.sparkSession
    pair_key = ["doc_a", "doc_b"]

    # -- pair-generation eval (the semantic_dedup candidate stage) -----
    a = embeddings.select(
        F.col(id_col).alias("doc_a"), F.col(vec_col).alias("va")
    )
    b = embeddings.select(
        F.col(id_col).alias("doc_b"), F.col(vec_col).alias("vb")
    )
    dot = F.aggregate(
        F.zip_with("va", "vb", lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    norm_a = F.sqrt(
        F.aggregate(
            "va", F.lit(0.0), lambda acc_, x: acc_ + x * x
        )
    )
    norm_b = F.sqrt(
        F.aggregate(
            "vb", F.lit(0.0), lambda acc_, x: acc_ + x * x
        )
    )
    cos = F.when(
        (norm_a > 0) & (norm_b > 0), dot / (norm_a * norm_b)
    ).otherwise(F.lit(0.0))
    # persist the expensive frames: each is consumed twice (count +
    # semi-join) and truth/exact are the O(n²) / full-scan halves — the
    # dedup_eval_report discipline
    truth = (
        a.crossJoin(b)
        .where(F.col("doc_a") < F.col("doc_b"))
        .where(F.round(cos, 5) >= threshold)
        .select("doc_a", "doc_b")
        .persist()
    )
    truth_n = truth.count()
    cand = embedding_cosine_pairs_gemm(
        embeddings,
        threshold=threshold,
        n_planes=n_planes,
        prefix_bits=prefix_bits,
        id_col=id_col,
        vec_col=vec_col,
    ).select("doc_a", "doc_b").persist()
    cand_n = cand.count()
    tp = truth.join(cand, pair_key, "left_semi").count()
    truth.unpersist()
    cand.unpersist()

    # -- ANN retrieval eval (recall@k of IVF vs exact) -----------------
    # query set = the n smallest ids (TakeOrdered, cheap) — dense-id
    # assumptions like `id < n` silently yield an EMPTY query set on
    # sparse or offset id spaces and the report would measure nothing
    queries = embeddings.orderBy(F.col(id_col)).limit(n_query_vecs)
    exact = brute_force_topk(
        embeddings, queries, k=topk, id_col=id_col, vec_col=vec_col,
        allow_full_scan=True,  # bounded by the max_vecs gate above
    ).select("query_id", "neighbor_id").persist()
    approx = ivf_topk(
        embeddings, queries, k=topk, n_centroids=n_centroids,
        nprobe=nprobe, id_col=id_col, vec_col=vec_col,
    ).select("query_id", "neighbor_id")
    exact_n = exact.count()
    ann_tp = exact.join(
        approx, ["query_id", "neighbor_id"], "left_semi"
    ).count()

    # -- PQ dial eval (ADC recall + exact rerank at realistic factors) -
    # guarded: pq_train needs >= n_codes sample vectors, and a tiny
    # corpus must degrade to null PQ rows, not kill the whole report
    # (the pre-existing pair/ANN sections still carry value)
    from .operators.pq import pq_encode, pq_topk_rerank, pq_train

    pq_tp: dict[int, int | None] = {f: None for f in pq_rerank_factors}
    pq_dims = None
    if n >= pq_codes:
        dims_row = embeddings.select(
            F.size(vec_col).alias("d")
        ).first()
        pq_dims = int(dims_row["d"]) if dims_row["d"] is not None else None
    if pq_dims is not None:
        cb = pq_train(
            embeddings,
            m_subspaces=min(pq_m, pq_dims),
            n_codes=pq_codes,
            id_col=id_col,
            vec_col=vec_col,
            n_dims=pq_dims,
        )
        enc = pq_encode(
            embeddings, cb, id_col=id_col, vec_col=vec_col
        ).persist()
        enc.count()
        for factor in pq_rerank_factors:
            served = pq_topk_rerank(
                embeddings, enc, queries, cb,
                k=topk, rerank_factor=factor,
                id_col=id_col, vec_col=vec_col,
            ).select("query_id", "neighbor_id")
            pq_tp[factor] = exact.join(
                served, ["query_id", "neighbor_id"], "left_semi"
            ).count()
        enc.unpersist()
    exact.unpersist()

    def _ratio(num: int, den: int) -> float | None:
        return round(num / den, 4) if den else None

    dials = (
        f"cos>={threshold},planes={n_planes},prefix={prefix_bits}"
    )
    ann_dials = (
        f"k={topk},centroids={n_centroids},nprobe={nprobe},"
        f"queries={n_query_vecs}"
    )
    rows = [
        ("embedding_dedup_eval", "n_vecs_evaluated", float(n), None),
        ("embedding_dedup_eval", "cosine_truth_pairs", float(truth_n), dials),
        ("embedding_dedup_eval", "lsh_prefix_candidates", float(cand_n), dials),
        (
            "embedding_dedup_eval",
            "semantic_pair_recall",
            _ratio(tp, truth_n),
            dials,
        ),
        (
            "embedding_dedup_eval",
            "semantic_pair_precision",
            _ratio(tp, cand_n),
            dials,
        ),
        ("embedding_dedup_eval", "exact_topk_pairs", float(exact_n), ann_dials),
        (
            "embedding_dedup_eval",
            "ivf_recall_at_k",
            _ratio(ann_tp, exact_n),
            ann_dials,
        ),
    ]
    for factor in pq_rerank_factors:
        rows.append(
            (
                "embedding_dedup_eval",
                f"pq_rerank_recall_at_k[factor={factor}]",
                (
                    _ratio(pq_tp[factor], exact_n)
                    if pq_tp[factor] is not None
                    else None
                ),
                (
                    f"k={topk},m={min(pq_m, pq_dims)},codes={pq_codes},"
                    f"factor={factor},queries={n_query_vecs}"
                    if pq_dims is not None
                    else f"skipped: corpus n={n} < n_codes={pq_codes}"
                ),
            )
        )
    return spark.createDataFrame(
        rows, "section string, metric string, value_num double, value_str string"
    )


def dedup_eval_report(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    jaccard_threshold: float = 0.5,
    shingle_k: int = 3,
    num_hashes: int | None = None,
    num_bands: int | None = None,
    max_shingle_freq: int = 50,
    simhash_bands: int = 4,
    max_hamming: int = 3,
    max_docs: int = 5_000,
) -> DataFrame:
    """``[section='dedup_eval', metric, value_num, value_str]`` — measured
    duplicate recall/precision of the APPROXIMATE dedup paths against
    their exact brute-force twins, at the dials passed in (VERDICT r5
    task 8).  Answers the operational question the dial docs can't: "at
    these settings, what fraction of true near-duplicates does the
    pipeline actually find, and how much of what it flags is real?"

    - MinHash-LSH candidates vs exact n-gram Jaccard ≥ threshold
      (``ngram_jaccard_pairs`` with NO df-cut is the exact twin);
    - the df-cut Jaccard variant vs the same truth — quantifying what
      ``max_shingle_freq`` trades away (its precision is 1.0 by
      construction: the cut prunes discovery, never the exact values);
    - SimHash banded pairs vs brute-force Hamming ≤ ``max_hamming``
      (recall is 1.0 whenever ``bits/simhash_bands ≥ max_hamming+1`` —
      the pigeonhole setting — and this MEASURES it rather than
      asserting it).

    This is a SAMPLED-CORPUS diagnostic, not a production pass: exact
    pair truth is worst-case quadratic (brute Hamming is always
    O(n²/2)), so the corpus is counted first and anything over
    ``max_docs`` fails loudly — sample upstream (``df.sample`` or a
    hash-bucket filter) and evaluate the sample, the same discipline as
    similarity.py's bounded query-set collect."""
    from .operators.dedup import (
        NUM_BANDS,
        NUM_HASHES,
        minhash_lsh_pairs,
        ngram_jaccard_pairs,
        release_intermediates,
        simhash,
        simhash_pairs,
    )

    num_hashes = NUM_HASHES if num_hashes is None else num_hashes
    num_bands = NUM_BANDS if num_bands is None else num_bands
    spark = docs.sparkSession
    n = docs.count()
    if n > max_docs:
        raise ValueError(
            f"dedup_eval_report is a sampled-corpus diagnostic: corpus has "
            f"{n} docs > max_docs={max_docs}; exact pair truth is "
            "worst-case quadratic — sample the corpus upstream and "
            "evaluate the sample (or raise max_docs deliberately)."
        )

    pair_key = ["doc_a", "doc_b"]
    truth = ngram_jaccard_pairs(
        docs, text_col, id_col, shingle_k,
        threshold=jaccard_threshold, max_shingle_freq=None,
    )
    cand = minhash_lsh_pairs(
        docs, text_col, id_col, num_hashes, num_bands, shingle_k
    )
    cut = ngram_jaccard_pairs(
        docs, text_col, id_col, shingle_k,
        threshold=jaccard_threshold, max_shingle_freq=max_shingle_freq,
    )
    truth_n = truth.count()
    cand_n = cand.count()
    tp = truth.join(cand, pair_key, "left_semi").count()
    cut_tp = truth.join(cut, pair_key, "left_semi").count()
    release_intermediates(truth)
    release_intermediates(cut)

    sh = simhash(docs, text_col, id_col)
    a = sh.selectExpr("doc_id as doc_a", "simhash as ha")
    b = sh.selectExpr("doc_id as doc_b", "simhash as hb")
    ham_truth = (
        a.crossJoin(b)
        .where(F.col("doc_a") < F.col("doc_b"))
        .where(
            F.bit_count(F.col("ha").bitwiseXOR(F.col("hb"))) <= max_hamming
        )
        .select("doc_a", "doc_b")
    )
    ham_truth_n = ham_truth.count()
    ham_cand = simhash_pairs(
        docs, text_col=text_col, id_col=id_col,
        n_bands=simhash_bands, max_hamming=max_hamming,
    )
    ham_cand_n = ham_cand.count()
    # simhash_pairs post-filters to true hamming <= max_hamming, so its
    # pairs SHOULD be a subset of brute truth (precision 1.0) — but
    # MEASURE the intersection rather than assume it (ADVICE r7): an
    # out-of-contract candidate (hamming > max_hamming, or a pair
    # ordered differently from truth) now shows up as precision < 1.0
    # instead of being defined away.
    ham_tp = ham_truth.join(ham_cand, pair_key, "left_semi").count()

    def _ratio(num: int, den: int) -> float | None:
        return round(num / den, 4) if den else None

    dials = (
        f"j>={jaccard_threshold},k={shingle_k},perm={num_hashes},"
        f"bands={num_bands}"
    )
    ham_dials = f"ham<={max_hamming},bands={simhash_bands}"
    rows = [
        ("dedup_eval", "n_docs_evaluated", float(n), None),
        ("dedup_eval", "jaccard_truth_pairs", float(truth_n), dials),
        ("dedup_eval", "minhash_lsh_candidates", float(cand_n), dials),
        ("dedup_eval", "minhash_lsh_recall", _ratio(tp, truth_n), dials),
        ("dedup_eval", "minhash_lsh_precision", _ratio(tp, cand_n), dials),
        (
            "dedup_eval",
            "jaccard_dfcut_recall",
            _ratio(cut_tp, truth_n),
            f"{dials},max_df={max_shingle_freq}",
        ),
        (
            "dedup_eval",
            "jaccard_dfcut_precision",
            1.0 if truth_n else None,  # exact values, pruned discovery
            f"{dials},max_df={max_shingle_freq}",
        ),
        ("dedup_eval", "hamming_truth_pairs", float(ham_truth_n), ham_dials),
        (
            "dedup_eval",
            "simhash_banded_recall",
            _ratio(ham_tp, ham_truth_n),
            ham_dials,
        ),
        (
            "dedup_eval",
            "simhash_banded_precision",
            _ratio(ham_tp, ham_cand_n),
            ham_dials,
        ),
    ]
    return spark.createDataFrame(
        rows, "section string, metric string, value_num double, value_str string"
    )
