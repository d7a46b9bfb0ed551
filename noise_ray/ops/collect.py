"""Driver-side collection of SMALL (vocabulary-/model-/edge-sized)
Dataset results.

``Dataset.to_arrow_refs()`` on a lazy dataset executes the plan TWICE:
``iter_internal_ref_bundles`` streams the blocks once, then its
``schema(fetch_if_missing=True)`` launches a second, limit-1 execution
that re-runs the WHOLE upstream pipeline (measured: the bigram-model
fold of ``ops.text.surprising_bigrams`` at 2M docs spent 79.6 s on the
real run plus 77.8 s on the schema probe).  ``materialize()`` first:
blocks and schema are then cached and ``to_arrow_refs`` is O(1).

Only use this for results that are SMALL by construction (map-side
combined vocabulary tables, model partials, dedup edge lists) — the
blocks land in the driver-reachable object store either way.
"""

from __future__ import annotations

import pyarrow as pa
import ray


def arrow_blocks(ds) -> list[pa.Table]:
    """All blocks of ``ds`` as pyarrow tables, executing the plan ONCE."""
    return ray.get(ds.materialize().to_arrow_refs())


def collect_table(ds, columns: list[str]) -> pa.Table | None:
    """Concatenate ``ds`` into one driver-side table with the given
    column order (Ray aggregate outputs can disagree on field order and
    emit odd-schema empty blocks).  None when no rows exist."""
    tabs = [t.select(columns) for t in arrow_blocks(ds) if t.num_rows]
    return pa.concat_tables(tabs) if tabs else None
