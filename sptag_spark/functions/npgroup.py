"""NumPy group-by for the Arrow-batch kernels.

Every scan kernel groups its batch rows by a key (query_id, or a packed
(query, list) key) before scoring. The obvious
``for k in np.unique(keys): np.nonzero(keys == k)`` is O(rows × groups) —
quadratic when both grow with the batch, which is exactly what happens as
posting/candidate batches get bigger at scale. This helper is the
O(n log n) replacement: one stable argsort, then contiguous slices.

The yielded index arrays are IDENTICAL to the mask version's (stable sort
⇒ groups in ascending key order, indices ascending within each group), so
swapping it in changes no kernel output, only its complexity.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np


def group_slices(keys: np.ndarray) -> Iterator[np.ndarray]:
    """Yield one ascending index array per distinct key, groups in
    ascending key order — the exact iteration order of
    ``for k in np.unique(keys): np.nonzero(keys == k)[0]``."""
    if len(keys) == 0:
        return
    order = np.argsort(keys, kind="stable")
    ko = keys[order]
    bounds = np.nonzero(ko[1:] != ko[:-1])[0] + 1
    starts = np.concatenate(([0], bounds))
    ends = np.concatenate((bounds, [len(ko)]))
    for s, e in zip(starts, ends):
        yield order[s:e]
