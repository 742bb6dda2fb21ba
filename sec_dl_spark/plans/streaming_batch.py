"""Batch-equivalent views of the streaming operators (filled in)."""

from __future__ import annotations
