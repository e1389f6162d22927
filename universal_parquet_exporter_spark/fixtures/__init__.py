"""Deterministic synthetic fixtures (seed-fixed, no wall clock, no
external data) — FIXTURES.md."""

from .webpages import WEBPAGES_SCHEMA, generate_webpages, generate_webpages_local

__all__ = ["WEBPAGES_SCHEMA", "generate_webpages", "generate_webpages_local"]
