"""Text / FTS / dedup / similarity queries (filled in as operators land)."""

from __future__ import annotations
