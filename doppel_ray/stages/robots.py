"""robots.txt parsing + crawl-policy URL filtering — the politeness
gate between frontier selection and fetching. A minimal, standard
subset of the robots exclusion protocol (RFC 9309): ``User-agent``
groups and ``Disallow`` path prefixes; an empty ``Disallow:`` allows
everything; comments (#) and unknown directives are ignored. ``Allow``
overrides are NOT implemented (documented subset — the conservative
reading blocks more, never less).

Scale shape: the compiled rule table (host -> disallow prefixes) is a
policy artifact bounded by the host universe, broadcast once in the
task closure / ``ray.put``; filtering is per-batch vectorized — rows
group by the batch's DISTINCT hosts (bounded by hosts, not rows) and
each host's prefixes apply as one ``starts_with`` per prefix over its
row slice. Zero shuffles.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ray.data import Dataset

from doppel_ray.stages.links import AUTH_RE, host_of


def parse_robots(text: str, agent: str = "*") -> list[str]:
    """robots.txt body -> sorted disallow path-prefixes applying to
    ``agent``: the union of groups named exactly ``agent`` and the
    wildcard ``*`` group (RFC 9309 group-matching, conservative
    subset). Empty ``Disallow:`` lines contribute nothing."""
    rules: list[str] = []
    current: set[str] = set()
    applies = False
    for raw in text.splitlines():
        line = raw.split("#", 1)[0].strip()
        if not line:
            continue
        key, _, val = line.partition(":")
        key, val = key.strip().lower(), val.strip()
        if key == "user-agent":
            current = {val.lower()}
            applies = val == "*" or val.lower() == agent.lower()
        elif key == "disallow" and applies and val:
            rules.append(val)
    return sorted(set(rules))


def robots_filter(
    ds: Dataset,
    rules: dict[str, list[str]],
    *,
    url_col: str = "url",
) -> Dataset:
    """Drop rows whose URL path falls under a disallowed prefix for its
    host. ``rules`` maps host -> disallow prefixes (from
    :func:`parse_robots`); hosts with no entry are fully allowed."""

    def fn(batch: pa.Table) -> pa.Table:
        urls = pc.cast(batch[url_col], pa.string())
        hosts = host_of(urls)
        paths = pc.replace_substring_regex(
            urls, pattern=AUTH_RE, replacement=""
        )
        keep = np.ones(len(batch), dtype=bool)
        hnp = hosts.to_numpy(zero_copy_only=False)
        for h in set(x for x in hnp if x is not None):
            prefixes = rules.get(h)
            if not prefixes:
                continue
            sel = hnp == h
            sub = paths.filter(pa.array(sel))
            bad = np.zeros(int(sel.sum()), dtype=bool)
            for p in prefixes:
                bad |= np.asarray(
                    pc.fill_null(pc.starts_with(sub, p), False).to_numpy(
                        zero_copy_only=False
                    ),
                    dtype=bool,
                )
            keep[np.nonzero(sel)[0][bad]] = False
        return batch.filter(pa.array(keep))

    return ds.map_batches(fn, batch_format="pyarrow")
