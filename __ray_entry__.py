"""Driver contract for the graft builder (Ray Data target).

Ray is initialised by the driver BEFORE this module is imported: no
``ray.init()``/``ray.shutdown()`` here or in the library (library code
never owns a Ray session; only bench.py / CLI scripts / the pytest
fixture do).
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Any


def entry() -> Any:
    """Flagship pipeline on /root/testdata/sf0.001: build the inverted
    index over ``documents`` (dedup'd, analyzed, segment-encoded,
    merge-shuffled, compressed) and run a BM25 top-10 query."""
    from alix_ray.pipelines import queries as q

    return q.q_bm25_top10("/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[str], Any]]:
    """One entry per implemented operator/pipeline from SURVEY.md §2
    (+ the training-data extensions).  Each callable takes ``sf_dir``."""
    from alix_ray.pipelines.queries import QUERIES

    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL per query (same column names + rounding).
    Queries without an entry are non-SQL-expressible (LSH/lemmatized/
    self-generated-corpus paths) → driver records rows-only checks."""
    from alix_ray.pipelines.queries import ORACLES

    return dict(ORACLES)
