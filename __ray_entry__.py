"""Driver contract for the graft builder (Ray Data target).

Ray is initialised by the driver BEFORE this module is imported; nothing
here calls ``ray.init()`` / ``ray.shutdown()``.

* ``entry()``      — flagship KG pipeline (extract → link → canonicalize →
  materialize) on the sf0.001 transcript fixture; returns the sorted,
  deduplicated triples Dataset.
* ``queries()``    — one callable per implemented operator/pipeline
  (SURVEY.md §2); each takes an sf_dir.
* ``oracle_sql()`` — DuckDB-runnable ANSI SQL recomputing each query on the
  same parquet inputs (transcript fixtures are generated deterministically
  under /tmp/yckg_fixtures when this is called).
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Any


def entry() -> Any:
    from the_yelp_collaborative_knowledge_graph_ray.pipelines.kg import run_kg
    return run_kg("/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[str], Any]]:
    from the_yelp_collaborative_knowledge_graph_ray import queries as q
    return q.queries()


def oracle_sql() -> dict[str, str]:
    from the_yelp_collaborative_knowledge_graph_ray import queries as q
    return q.oracle_sql()
