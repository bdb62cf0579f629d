"""Session wiring for the JVM Catalyst index-rewrite extension.

``jvm/src/org/polarsindex/PostingsIndexRule.java`` is the engine-level
form of the Python planning layer in :mod:`.catalog` — the north-star
"custom Catalyst optimization for inverted index".  With the extension
installed, a postings aggregate (the reference's get_field_values
semantic, main.rs:325-385) over a (table, field) whose index is
materialized under ``spark.polars.index.root`` is rewritten in the
optimizer to a scan of the index parquet: no base-table scan, no
shuffle, no aggregate — the plan a purpose-built index engine would run.

The extension binds at JVM creation (``spark.sql.extensions`` +
``spark.jars``), so it must be configured on the *builder* before the
first session exists; it cannot be turned on for a live session.  The
Python layer (:class:`.catalog.IndexCatalog` lookups) remains the
portable fallback when the jar isn't on the classpath — both answer the
same queries, verified against the same oracle.

Build the jar once with ``sh jvm/build.sh`` (javac against the
pyspark-bundled Spark jars; no Maven/scalac needed).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

EXTENSION_CLASS = "org.polarsindex.PostingsIndexExtensions"
INDEX_ROOT_KEY = "spark.polars.index.root"

_REPO_ROOT = os.path.dirname(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)
DEFAULT_JAR = os.path.join(_REPO_ROOT, "jvm", "polars-index-ext.jar")


def jar_available(jar_path: str = DEFAULT_JAR) -> bool:
    return os.path.exists(jar_path)


def with_index_extension(
    builder: SparkSession.Builder,
    index_root: str,
    jar_path: str = DEFAULT_JAR,
) -> SparkSession.Builder:
    """Configure ``builder`` so sessions it creates run the Catalyst
    index-rewrite rule with indexes rooted at ``index_root``.

    Raises ``FileNotFoundError`` when the jar hasn't been built — callers
    that want silent fallback should guard with :func:`jar_available`.
    """
    if not jar_available(jar_path):
        raise FileNotFoundError(
            f"{jar_path} missing - build it with `sh jvm/build.sh`"
        )
    return (
        builder.config("spark.jars", jar_path)
        .config("spark.driver.extraClassPath", jar_path)
        .config("spark.sql.extensions", EXTENSION_CLASS)
        .config(INDEX_ROOT_KEY, index_root)
    )
