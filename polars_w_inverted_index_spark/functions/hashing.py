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
