"""Streaming-derived queries (incremental ingest parity checks).

Populated as the streaming/ modules land.
"""

from __future__ import annotations

QUERIES: dict = {}
ORACLES: dict = {}
