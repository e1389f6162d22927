"""Sources & session: SparkSession construction, table readers, and the
``upe_encoded`` Spark DataSource (``.spark_datasource`` — imported lazily
there so plain codec use never pays the pyspark.sql.datasource import)."""

from .session import build_session
from .tables import load_tables, register_views

__all__ = ["build_session", "load_tables", "register_views"]
