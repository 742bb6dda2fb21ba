"""Shared cross-engine numeric conventions for the query catalog.

Zero-normalizing rounded float aggregate, both engines. IEEE round()
keeps the sign bit, so a tiny NEGATIVE average rounds to -0.0 in DuckDB
but +0.0 in Spark — same magnitude, different serialized hash (this
exact class failed corpus_dsir_weights' driver hash in round 6).
Appending ``+ 0.0`` AFTER the round normalizes: IEEE defines
``-0.0 + 0.0 = +0.0``, and every nonzero value is unchanged. Use these
for ANY float aggregate whose rounded value can straddle zero — and use
them from here: the plan modules used to each carry their own
``rz6 = lambda ...`` copy of the 6-digit form, which made the nudge
policy unchangeable in one place.
"""

from __future__ import annotations

from pyspark.sql import functions as F


def rz(col, digits: int = 4, nudge: float = 1e-9):
    """Spark side: round(col + nudge, digits) with -0.0 normalized to +0.0."""
    return F.round(col + F.lit(nudge), digits) + F.lit(0.0)


def rz_sql(expr: str, digits: int = 4, nudge: str = "1e-9") -> str:
    """DuckDB oracle twin of :func:`rz` (identical nudge + normalization)."""
    return f"(round(({expr}) + {nudge}, {digits}) + 0.0)"


def rz6(col):
    """:func:`rz` at 6 digits — the precision most count-ratio outputs
    use; a named helper (not a per-module lambda) so call sites read
    the same everywhere."""
    return rz(col, 6)


def rz6_sql(expr: str) -> str:
    """DuckDB twin of :func:`rz6`."""
    return rz_sql(expr, 6)
