"""Partition planning: size-aware range boundaries + skew salting."""

from .partitioning import EncodePlan, assign_units, assign_units_arrow, plan_encode

__all__ = ["EncodePlan", "plan_encode", "assign_units", "assign_units_arrow"]
