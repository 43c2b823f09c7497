"""Driver contract for the graft builder (Ray Data target).

The driver calls ``entry()`` as a smoke check (Ray already
initialised), runs each ``queries()[name](sf_dir)`` at sf=0.01 and
compares against the matching ``oracle_sql()[name]`` via DuckDB.

No ``ray.init`` / ``ray.shutdown`` here or in the library code these
call (tests and bench.py own their sessions).
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Any


def entry() -> Any:
    """Flagship spatial-join pipeline at small scale: synthesize the
    image+caption table (the driver input_hint shape, FIXTURES.md §1),
    geotag, cell-assign, covering-join against the city polygon set,
    and return the match table."""
    from geo_ray.pipelines.queries import q_spatial_join_images

    return q_spatial_join_images("/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[str], Any]]:
    from geo_ray.pipelines.queries import queries as _q

    return _q()


def oracle_sql() -> dict[str, str]:
    from geo_ray.pipelines.queries import oracle_sql as _o

    return _o()
