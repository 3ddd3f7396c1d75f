"""Exact distributed quantiles over a (discrete) numeric column.

Shape: one ``groupby(col).count()`` shuffle builds the value histogram —
the only thing that ever leaves the workers — then the (small) histogram
is sorted and walked cumulatively. Exactness costs one exchange of
``distinct-values`` rows instead of a full sort of the dataset; the
documented bound is that the histogram fits the driver (true for
discrete stats such as token counts, sizes, or session lengths — for
continuous columns, bucket first and accept bucket resolution).

Quantile rule matches DuckDB's ``quantile_disc``: the element at sorted
index ``max(ceil(p*n) - 1, 0)`` (verified empirically for n in {4,5,10}
across p in {0, .25, .5, .75, .9, .99, 1}), with ``p*n`` computed in
IEEE doubles on both sides so the index arithmetic cannot drift.
"""

from __future__ import annotations

import math

from ray.data import Dataset
from ray.data.aggregate import Count


def exact_quantiles(
    ds: Dataset, col: str, ps: list[float]
) -> list[tuple[float, int]]:
    """[(p, value)] exact discrete quantiles of ``ds[col]``."""
    hist = ds.groupby(col).aggregate(Count(alias_name="cnt")).take_all()
    hist.sort(key=lambda r: r[col])
    n = sum(r["cnt"] for r in hist)
    if n == 0:
        return []
    out = []
    for p in ps:
        idx = max(math.ceil(p * n) - 1, 0)
        acc = 0
        for r in hist:
            acc += r["cnt"]
            if acc > idx:
                out.append((p, r[col]))
                break
    return out
