"""Partition planning: size-aware range boundaries + skew salting."""

from .partitioning import EncodePlan, assign_units, plan_encode

__all__ = ["EncodePlan", "plan_encode", "assign_units"]
