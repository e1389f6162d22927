"""Drop-in compatibility facade over the reference's two core classes,
so a user of `universal-parquet-exporter` can switch engines without
rewriting call sites:

- :class:`QueryExecutor` — the reference's SQL pass-through surface
  (``/root/reference/src/query/query_executor.py:8-37``: execute a SQL
  string, name columns, return ``List[Dict]``).  Here the "connection"
  is a :class:`SparkSession` and the SQL runs in Catalyst against
  registered views/tables instead of a remote MySQL/SQL Server.
- :class:`ParquetWriter` — the reference's sink
  (``/root/reference/src/export/parquet_writer.py:8-17``: list-of-dicts
  → single Parquet file via pandas, error on empty input).

Both deliberately keep the reference's DRIVER-SIDE materialization
contract — that is what "drop-in" means — so they are for modest result
sets only.  The engine-native surfaces (`export.ParquetExporter`,
`encode.pipeline`, the DataFrame operators) stay columnar and
distributed end-to-end; new code should use those.
"""

from __future__ import annotations

from typing import Any

from pyspark.sql import SparkSession


class QueryExecutor:
    """Execute a SQL string, return one dict per row with column names
    as keys — the reference's exact result shape (its README insists on
    dict rows so Parquet columns get real names; ``README.md:312-314``).

    Cursor plumbing (open/describe/fetchall/zip/close —
    ``query_executor.py:18-37``) has no analog: Catalyst planning and
    the driver collect replace it wholesale."""

    def __init__(self, connection: SparkSession) -> None:
        self.connection = connection

    def execute_query(self, query: str) -> list[dict[str, Any]]:
        df = self.connection.sql(query)
        return [row.asDict(recursive=True) for row in df.collect()]


class ParquetWriter:
    """List-of-dicts → one Parquet file, schema inferred from dict keys;
    empty input raises ``ValueError`` exactly like the reference (an
    empty list carries no inferable schema — ``parquet_writer.py:10-11``).
    For schema'd empty results and distributed writes use
    :class:`..export.ParquetExporter`, which fixes that limitation."""

    def write_to_parquet(self, data: list[dict[str, Any]], file_path: str) -> None:
        import pandas as pd

        if not data:
            raise ValueError("empty result set has no inferable schema to write")
        pd.DataFrame(data).to_parquet(file_path, index=False)
