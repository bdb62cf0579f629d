"""Property-based checks for search and chunking (hypothesis).

Each Spark operator is compared against an independent pure-Python
reference model on randomized inputs — tiny vocabularies maximize
collision/adjacency edge cases (repeated words, phrases spanning chunk
boundaries, empty docs) that fixed fixtures under-sample.
"""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from polars_w_inverted_index_spark.operators.chunking import (
    chunk_documents,
)
from polars_w_inverted_index_spark.operators.search import (
    bm25_search,
    bm25_search_from_index,
    boolean_search,
    build_search_index,
    phrase_search,
    phrase_search_indexed,
    positional_postings,
)
from polars_w_inverted_index_spark.session import get_session

_SETTINGS = settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow],
)

VOCAB = ["a", "b", "c", "dd"]
TEXTS = st.lists(st.sampled_from(VOCAB), min_size=0, max_size=20).map(
    " ".join
)
CORPUS = st.lists(TEXTS, min_size=1, max_size=8)


def _spark_docs(texts):
    spark = get_session("search_properties")
    return spark, spark.createDataFrame(
        list(enumerate(texts)), "doc_id long, text string"
    )


def _ref_chunks(texts, window, stride):
    out = []
    for doc_id, text in enumerate(texts):
        toks = text.split()
        if not toks:
            continue
        idx = 0
        for s in range(0, len(toks), stride):
            if s > 0 and s - stride + window >= len(toks):
                continue  # previous window already reached the end
            piece = toks[s : s + window]
            out.append((doc_id, idx, len(piece), " ".join(piece)))
            idx += 1
    return sorted(out)


@_SETTINGS
@given(
    texts=CORPUS,
    window=st.integers(1, 8),
    overlap=st.integers(0, 7),
)
def test_chunking_matches_reference(texts, window, overlap):
    stride = max(1, window - overlap)
    spark, docs = _spark_docs(texts)
    got = sorted(
        tuple(r)
        for r in chunk_documents(
            docs, window=window, stride=stride
        ).collect()
    )
    assert got == _ref_chunks(texts, window, stride)


def _ref_phrase(texts, phrase):
    q = phrase.split()
    hits = []
    for doc_id, text in enumerate(texts):
        toks = text.split()
        for s in range(0, len(toks) - len(q) + 1):
            if toks[s : s + len(q)] == q:
                hits.append(doc_id)
                break
    return hits


@_SETTINGS
@given(
    texts=CORPUS,
    phrase=st.lists(
        st.sampled_from(VOCAB), min_size=1, max_size=4
    ).map(" ".join),
)
def test_phrase_search_both_forms_match_reference(texts, phrase):
    spark, docs = _spark_docs(texts)
    want = sorted(_ref_phrase(texts, phrase))
    scan = sorted(
        r.doc_id for r in phrase_search(docs, phrase).collect()
    )
    assert scan == want
    served = sorted(
        r.doc_id
        for r in phrase_search_indexed(
            positional_postings(docs), phrase
        ).collect()
    )
    assert served == want


@_SETTINGS
@given(texts=CORPUS, terms=st.sets(st.sampled_from(VOCAB), min_size=1))
def test_boolean_search_matches_reference(texts, terms):
    spark, docs = _spark_docs(texts)
    for mode, req in (("and", len(terms)), ("or", 1)):
        got = sorted(
            (r.doc_id, r.n_matched)
            for r in boolean_search(
                docs, sorted(terms), mode=mode
            ).collect()
        )
        want = sorted(
            (i, n)
            for i, text in enumerate(texts)
            if (n := len(terms & set(text.split()))) >= req
        )
        assert got == want, mode


@_SETTINGS
@given(texts=CORPUS, terms=st.sets(st.sampled_from(VOCAB), min_size=1))
def test_bm25_inline_equals_served_on_random_corpora(texts, terms):
    spark, docs = _spark_docs(texts)
    inline = {
        r.doc_id: (r.score, r.n_matched)
        for r in bm25_search(docs, sorted(terms), top_k=None).collect()
    }
    idx, stats = build_search_index(docs)
    served = {
        r.doc_id: (r.score, r.n_matched)
        for r in bm25_search_from_index(
            idx, stats, sorted(terms), top_k=None
        ).collect()
    }
    assert inline.keys() == served.keys()
    for k in inline:
        assert inline[k][1] == served[k][1]
        assert abs(inline[k][0] - served[k][0]) < 1e-9
