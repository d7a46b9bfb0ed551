"""Small shared numpy helpers."""

from __future__ import annotations

import numpy as np


def sorted_member_mask(sorted_vals: np.ndarray,
                       values: np.ndarray) -> np.ndarray:
    """Boolean mask over ``values``: True where the value occurs in the
    ascending (possibly empty) ``sorted_vals``.

    One place for the searchsorted + clamp-last + compare idiom that was
    hand-rolled at several call sites (tombstone exclusion, allowed-doc
    restriction, live-set filters) — the clamp edge cases (empty array,
    value past the end) live here once."""
    values = np.asarray(values)
    if sorted_vals.size == 0 or values.size == 0:
        return np.zeros(values.size, dtype=bool)
    pos = np.searchsorted(sorted_vals, values)
    pos[pos >= sorted_vals.size] = sorted_vals.size - 1
    return sorted_vals[pos] == values
