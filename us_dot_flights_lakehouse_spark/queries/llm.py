"""Training-data pipeline queries (dedup / similarity / text analysis).

Populated as the llm/ operator modules land.
"""

from __future__ import annotations

QUERIES: dict = {}
ORACLES: dict = {}
