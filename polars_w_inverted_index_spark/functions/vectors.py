"""Vector expression builders over ``array<float|double>`` columns.

Dot product / norm / cosine as built-in higher-order functions
(``zip_with`` + ``aggregate``): JVM-side, codegen-friendly, no Python in
the hot path — the baseline ANN path runs these over every candidate pair.
Each has a DuckDB twin for the oracle suite.

Float discipline: embeddings are ``array<float>``; both engines upcast to
double before multiply-accumulate (explicit cast here, ``::DOUBLE[]`` in
SQL) so the accumulation is double-precision in both.  Comparisons still
round (summation order is engine-defined) — see registry conventions.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _c(col: Column | str) -> Column:
    return F.col(col) if isinstance(col, str) else col


def dot(a: Column | str, b: Column | str) -> Column:
    return F.aggregate(
        F.zip_with(
            _c(a), _c(b), lambda x, y: x.cast("double") * y.cast("double")
        ),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def norm(a: Column | str) -> Column:
    return F.sqrt(
        F.aggregate(
            _c(a),
            F.lit(0.0),
            lambda acc, x: acc + x.cast("double") * x.cast("double"),
        )
    )


def cosine(a: Column | str, b: Column | str) -> Column:
    """Cosine similarity; 0.0 when either vector has zero norm."""
    d = dot(a, b)
    na, nb = norm(a), norm(b)
    return F.when((na > 0) & (nb > 0), d / (na * nb)).otherwise(F.lit(0.0))


def cosine_with_norms(
    a: Column | str, b: Column | str, na: Column, nb: Column
) -> Column:
    """Cosine given precomputed norms.  In pairwise plans (bucket
    self-joins, query×corpus) norms are per-VECTOR, so computing them once
    before the join instead of per-PAIR cuts the higher-order-function work
    per candidate from 3 dot products to 1."""
    return F.when(
        (na > 0) & (nb > 0), dot(a, b) / (na * nb)
    ).otherwise(F.lit(0.0))


def random_projection(
    col: Column | str, in_dims: int, out_dims: int, seed: str = "rp"
) -> Column:
    """Seeded ±1 random-projection dim reduction: ``array<double>`` of
    length ``out_dims`` with y[j] = <v, R_j> / sqrt(out_dims).

    Johnson–Lindenstrauss with an Achlioptas ±1 matrix (Achlioptas 2003:
    database-friendly random projections — ±1 entries preserve pairwise
    distances in expectation exactly like Gaussians): shrinks embedding
    width before LSH/IVF/pairwise work so downstream dots cost
    ``out_dims`` multiplies instead of ``in_dims``.

    Engine discipline (same as the LSH hyperplanes, similarity.py):
    the matrix is derived from md5(seed:j:d) parities driver-side ONCE
    and embedded as literals — deterministic across engines/runs, no
    stored model, no RNG state, and per-row cost is pure multiply-adds
    in a JVM higher-order expression.  BOTH sides of the zip are sliced
    to ``min(len(v), in_dims)`` — ``zip_with`` pads the shorter array
    with nulls (it does NOT stop), and one null poisons the aggregate
    sum, so an unsliced mismatch would yield all-null projections.
    Rows shorter than ``in_dims`` use a weight prefix; rows longer use
    their first ``in_dims`` entries.
    """
    import hashlib

    c = _c(col)
    scale = 1.0 / (out_dims ** 0.5)
    # ONE nested array literal (out_dims × in_dims) instead of out_dims
    # separate in_dims-literal arrays — the flat form's expression tree
    # made analysis cost dominate small batches (same fix as
    # similarity.hyperplane_signature, measured ~2× there).
    weights = [
        [
            float(
                (
                    int(
                        hashlib.md5(
                            f"{seed}:{j}:{d}".encode()
                        ).hexdigest()[:15],
                        16,
                    )
                    & 1
                )
                * 2
                - 1
            )
            for d in range(in_dims)
        ]
        for j in range(out_dims)
    ]
    cp = F.slice(c, 1, in_dims)
    wlen = F.least(F.size(c), F.lit(in_dims))
    return F.transform(
        F.lit(weights),
        lambda w: F.aggregate(
            F.zip_with(
                cp, F.slice(w, 1, wlen), lambda x, h: x.cast("double") * h
            ),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
        * F.lit(scale),
    )


def cosine_sql(a: str, b: str) -> str:
    """DuckDB twin — same zero-norm rule, double accumulation, and the
    same out-of-contract behavior: RAGGED lengths yield NULL (Spark's
    zip_with null-pads and one null poisons the fold; DuckDB's
    list_sum would silently SKIP the null products and return a
    partial prefix dot — the r8 fuzz finding), unless a zero norm
    already forces the 0.0 branch.  Callers are expected to pre-slice
    to a common width (similarity.py does); the twin just must not
    disagree when they don't."""
    def _dot(x: str, y: str) -> str:
        return (
            f"list_sum(list_transform(range(1, length({x}) + 1),"
            f" i -> {x}[i]::DOUBLE * {y}[i]::DOUBLE))"
        )

    # NULL (not partial) when lengths differ — matches the Spark fold
    ab = (
        f"(CASE WHEN length({a}) = length({b})"
        f" THEN {_dot(a, b)} END)"
    )
    na = f"sqrt({_dot(a, a)})"
    nb = f"sqrt({_dot(b, b)})"
    return (
        f"(CASE WHEN {na} > 0 AND {nb} > 0"
        f" THEN {ab} / ({na} * {nb}) ELSE 0.0 END)"
    )
