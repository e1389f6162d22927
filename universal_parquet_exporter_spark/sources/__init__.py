"""Sources & session: SparkSession construction and table readers."""

from .session import build_session
from .tables import load_tables, register_views

__all__ = ["build_session", "load_tables", "register_views"]
