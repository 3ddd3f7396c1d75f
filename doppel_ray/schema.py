"""Arrow schemas for the corpus, intermediate, and output tables.

Mirrors the reference's data model (SURVEY.md §1): the corpus record is the
web-page analog of ``FileInfo`` (reference internal/scanner/hasher.go:14-19),
the duplicate-group output row mirrors ``model.DuplicateGroup``
(reference internal/model/model.go:18-33), and the report summary mirrors
``model.Stats`` / ``DuplicateReport`` (model/model.go:36-78).
"""

from __future__ import annotations

import pyarrow as pa

# Primary corpus table (BASELINE.json input_hint / FIXTURES.md §1).
PAGES_SCHEMA = pa.schema(
    [
        ("url", pa.string()),
        ("warc_ts", pa.timestamp("us")),
        ("html", pa.binary()),
        ("text", pa.large_string()),
        ("lang", pa.string()),
    ]
)

# Duplicate-group output row (reference model/model.go:18-33). Group ids are
# stable (min member url) because the reference's sequential ids follow Go
# map-iteration order and are nondeterministic (SURVEY.md G4).
GROUPS_SCHEMA = pa.schema(
    [
        ("group_id", pa.string()),
        ("count", pa.int64()),
        ("size", pa.int64()),
        ("wasted_space", pa.int64()),
        ("files", pa.list_(pa.string())),
    ]
)

# Near-dup verified edge (not in the reference; north-rule stage).
EDGES_SCHEMA = pa.schema(
    [
        ("url_a", pa.string()),
        ("url_b", pa.string()),
        ("similarity", pa.float64()),
        ("kind", pa.string()),  # exact | minhash | simhash | contain | embed
    ]
)

# Cluster assignment (connected components over verified edges).
CLUSTERS_SCHEMA = pa.schema(
    [
        ("url", pa.string()),
        ("cluster_id", pa.string()),  # min url of the component
    ]
)

# Report summary fields (reference model/model.go:51-78 Stats +
# DuplicateReport model/model.go:36-48).
STATS_FIELDS = (
    "total_files",
    "processed_files",
    "skipped_files",
    "skipped_dirs",
    "error_count",
    "duplicate_groups",
    "duplicate_files",
)
