"""Batch query→Parquet export orchestration (the reference's raison
d'être, re-expressed distributed)."""

from .exporter import ExportResult, ParquetExporter, create_timestamped_directory

__all__ = ["ParquetExporter", "ExportResult", "create_timestamped_directory"]
