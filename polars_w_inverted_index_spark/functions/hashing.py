"""Cross-engine deterministic hashing.

Dedup/minhash/simhash need hash functions that produce IDENTICAL values in
Spark (the engine) and DuckDB (the correctness oracle).  Native 64-bit
hashes differ (Spark xxhash64/murmur vs DuckDB's hash), so we derive a
60-bit integer from an md5 prefix — md5 is bit-identical everywhere:

    spark:  conv(substring(md5(s), 1, 15), 16, 10)  :: long
    duckdb: ('0x' || substr(md5(s), 1, 15))::BIGINT

15 hex chars = 60 bits < 2^63, so the value is always a non-negative long.
A ``salt`` namespace turns one hash into a family (minhash permutations).

At 100 TB this stays JVM-side whole-stage-codegen (md5/conv/substring are
built-in expressions) — no Python in the hot path.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

HASH_BITS = 60
HASH_MAX = (1 << 60) - 1


def md5_long(col: Column | str, salt: int | None = None) -> Column:
    """60-bit deterministic hash of a string column (Spark side)."""
    c = F.col(col) if isinstance(col, str) else col
    if salt is not None:
        c = F.concat(F.lit(f"{salt}:"), c)
    return F.conv(F.substring(F.md5(c), 1, 15), 16, 10).cast("long")


def md5_long_sql(expr: str, salt: int | None = None) -> str:
    """The DuckDB-SQL twin of :func:`md5_long`. ``expr`` is a SQL string."""
    inner = f"'{salt}:'||{expr}" if salt is not None else expr
    return f"(('0x'||substr(md5({inner}),1,15))::BIGINT)"


# ---------------------------------------------------------------------------
# Universal hash family over one base hash (the MinHash permutation family)
# ---------------------------------------------------------------------------
# One md5 per input string, then h_j(x) = (a_j·h + b_j) mod p for each of the
# k permutations — integer multiply-adds instead of k md5 string pipelines
# (~16× less work in the minhash hot path; identical arithmetic in DuckDB).
# p = 2^31-1 (Mersenne); base and a_j < p keep every product < 2^62, so the
# BIGINT math never overflows in either engine.

UH_PRIME = (1 << 31) - 1


def uh_params(j: int) -> tuple[int, int]:
    """Deterministic (a_j, b_j) for permutation ``j`` — digits of md5, the
    same constants on both engines because they're computed here once."""
    import hashlib

    a = int(hashlib.md5(f"uh-a:{j}".encode()).hexdigest()[:15], 16)
    b = int(hashlib.md5(f"uh-b:{j}".encode()).hexdigest()[:15], 16)
    return a % (UH_PRIME - 1) + 1, b % UH_PRIME


def uh_base(col: Column | str) -> Column:
    """Base hash reduced into the field: md5_long(x) mod p."""
    return F.pmod(md5_long(col), F.lit(UH_PRIME))


def uh_base_sql(expr: str) -> str:
    return f"({md5_long_sql(expr)} % {UH_PRIME})"


def uh_apply(base: Column, j: int) -> Column:
    a, b = uh_params(j)
    return F.pmod(base * F.lit(a) + F.lit(b), F.lit(UH_PRIME))


def uh_apply_sql(base_expr: str, j: int) -> str:
    a, b = uh_params(j)
    return f"(({base_expr} * {a} + {b}) % {UH_PRIME})"
