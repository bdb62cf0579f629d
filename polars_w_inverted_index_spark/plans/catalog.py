"""IndexCatalog: materialized inverted indexes as reusable artifacts.

The reference rebuilds its postings map per query and discards it
(main.rs:325-385) — SURVEY.md §4 calls materialization out as "the one
custom piece".  An index here is a parquet table ``[value string, doc_ids
array<long>]`` (chunked form adds ``chunk``) written per (table, field).

At 100 TB the index table is itself large; we bucket the write by value hash
(``repartition(n, value)`` + sorted within partitions) so a value-lookup
touches few files and no single file holds the whole index.  Prior art:
Microsoft Hyperspace (VLDB 2021) — index as a side table + a planner-layer
rewrite, no engine fork needed.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession

from ..operators.inverted_index import postings, postings_chunked


class IndexCatalog:
    """Tracks which (table, field) postings indexes exist on disk."""

    def __init__(self, spark: SparkSession, root: str):
        self.spark = spark
        self.root = root
        self._meta_path = os.path.join(root, "_index_catalog.json")
        self._meta: dict[str, dict] = {}
        if os.path.exists(self._meta_path):
            with open(self._meta_path) as f:
                self._meta = json.load(f)

    def _key(self, table: str, field: str) -> str:
        return f"{table}::{field}"

    def _path(self, table: str, field: str) -> str:
        safe = f"{os.path.basename(table)}__{field}".replace("/", "_")
        return os.path.join(self.root, safe)

    def build(
        self,
        df: DataFrame,
        table: str,
        field: str,
        doc_id_col: str = "doc_id",
        chunked: bool = False,
        max_postings_per_row: int = 1_000_000,
        num_buckets: int | None = None,
    ) -> str:
        """Materialize the postings index for (table, field) → parquet."""
        idx = (
            postings_chunked(df, field, doc_id_col, max_postings_per_row)
            if chunked
            else postings(df, field, doc_id_col)
        )
        path = self._path(table, field)
        writer = idx
        if num_buckets:
            writer = idx.repartition(num_buckets, "value").sortWithinPartitions(
                "value"
            )
        writer.write.mode("overwrite").parquet(path)
        # Bind the index to its source data: the Catalyst rule refuses to
        # serve an index whose recorded source doesn't cover the scanned
        # path, so two tables sharing a file stem (or a relocated table)
        # can never be silently answered from the wrong index.
        src = self._source_root(df)
        if src is not None:
            with open(os.path.join(path, "_index_source"), "w") as f:
                f.write(src)
        self._meta[self._key(table, field)] = {
            "path": path,
            "chunked": chunked,
            "doc_id_col": doc_id_col,
            "source": src,
        }
        os.makedirs(self.root, exist_ok=True)
        with open(self._meta_path, "w") as f:
            json.dump(self._meta, f, indent=2)
        return path

    @staticmethod
    def _source_root(df: DataFrame) -> str | None:
        """Common root of the frame's input files (scheme-stripped); None
        for non-file sources (in-memory frames)."""
        from urllib.parse import urlparse

        files = [
            urlparse(f).path if "://" in f or f.startswith("file:") else f
            for f in df.inputFiles()
        ]
        if not files:
            return None
        if len(files) == 1:
            return files[0]
        common = os.path.commonpath(files)
        return common

    def lookup(self, table: str, field: str) -> DataFrame | None:
        """Postings DataFrame for (table, field) if materialized, else None.

        Chunked indexes are re-merged lazily (groupBy value + flatten) so
        callers always see the logical ``[value, doc_ids]`` shape.
        """
        meta = self._meta.get(self._key(table, field))
        if meta is None or not os.path.exists(meta["path"]):
            return None
        df = self.spark.read.parquet(meta["path"])
        if meta.get("chunked"):
            from pyspark.sql import functions as F

            df = (
                df.groupBy("value")
                .agg(F.sort_array(F.flatten(F.collect_list("doc_ids"))).alias("doc_ids"))
            )
        return df

    def drop(self, table: str, field: str) -> None:
        self._meta.pop(self._key(table, field), None)
        with open(self._meta_path, "w") as f:
            json.dump(self._meta, f, indent=2)
