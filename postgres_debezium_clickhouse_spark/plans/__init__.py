"""Query plans: the engine's registered query surface.

Each submodule exposes ``QUERIES: dict[str, Callable[[SparkSession, str],
DataFrame]]`` and ``ORACLES: dict[str, str]`` (DuckDB ANSI SQL over the same
fixture tables) — aggregated by ``__spark_entry__``.
"""

from __future__ import annotations
