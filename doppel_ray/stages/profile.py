"""Table profiler: per-column data-quality summary in one streaming
pass plus one narrow distinct-count groupby per column — the schema
audit a pipeline runs before trusting an unfamiliar corpus drop.

Per column: row count, null count, exact distinct count, min and max
(as canonical strings, so one relation covers mixed column types).
The (n, n_null, min, max) partials fold per batch and merge on the
driver (constant-size state per column); ``n_distinct`` is exact via a
key-only ``groupby(col).count()`` whose shuffle carries distinct values
only. Supported kinds: integers, strings, and timestamps (profiled as
epoch micros); floats are deliberately excluded from the string min/max
(formatting is engine-specific) — scale them to ints first, the
repo-wide floored-cents stance.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ray.data import Dataset


def _canon(val, typ: pa.DataType) -> str:
    if val is None:
        return ""
    if pa.types.is_integer(typ) or pa.types.is_timestamp(typ):
        return str(int(val))
    return str(val)


def profile_table(ds: Dataset, cols: list[str]) -> pa.Table:
    """One profile row per column: ``(col, n, n_null, n_distinct,
    min_s, max_s)`` — module docstring for the scale shape."""
    schema = ds.schema()
    types = dict(zip(schema.names, schema.types))
    for c in cols:
        t = types[c]
        if not (
            pa.types.is_integer(t)
            or pa.types.is_string(t)
            or pa.types.is_large_string(t)
            or pa.types.is_timestamp(t)
        ):
            raise ValueError(
                f"profile_table: unsupported column type {t} for {c!r}; "
                "scale floats to ints first"
            )

    def partial(batch: pa.Table) -> pa.Table:
        rows = []
        for c in cols:
            arr = batch[c]
            if pa.types.is_timestamp(arr.type):
                arr = pc.cast(arr, pa.int64())
            n = len(arr)
            n_null = arr.null_count
            mm = pc.min_max(arr).as_py() if n > n_null else None
            rows.append(
                {
                    "col": c,
                    "n": n,
                    "n_null": n_null,
                    "min_s": _canon(mm["min"], types[c]) if mm else None,
                    "max_s": _canon(mm["max"], types[c]) if mm else None,
                }
            )
        return pa.Table.from_pylist(
            rows,
            schema=pa.schema(
                [
                    ("col", pa.string()),
                    ("n", pa.int64()),
                    ("n_null", pa.int64()),
                    ("min_s", pa.string()),
                    ("max_s", pa.string()),
                ]
            ),
        )

    acc: dict[str, dict] = {
        c: {"n": 0, "n_null": 0, "min_s": None, "max_s": None} for c in cols
    }
    for b in ds.select_columns(cols).map_batches(
        partial, batch_format="pyarrow", batch_size=None
    ).iter_batches(batch_format="pyarrow", batch_size=None):
        for r in b.to_pylist():
            a = acc[r["col"]]
            a["n"] += r["n"]
            a["n_null"] += r["n_null"]
            for k, pick in (("min_s", min), ("max_s", max)):
                if r[k] is not None:
                    a[k] = r[k] if a[k] is None else pick(a[k], r[k], key=_ord(types[r["col"]]))

    out = []
    for c in cols:
        # exact COUNT(DISTINCT): key-only shuffle of distinct values
        nd = (
            ds.select_columns([c])
            .map_batches(
                lambda b, col=c: b.drop_null().group_by(col).aggregate([]),
                batch_format="pyarrow",
            )
            .groupby(c)
            .count()
            .count()
        )
        out.append(
            {
                "col": c,
                "n": acc[c]["n"],
                "n_null": acc[c]["n_null"],
                "n_distinct": nd,
                "min_s": acc[c]["min_s"] or "",
                "max_s": acc[c]["max_s"] or "",
            }
        )
    return pa.Table.from_pylist(
        out,
        schema=pa.schema(
            [
                ("col", pa.string()),
                ("n", pa.int64()),
                ("n_null", pa.int64()),
                ("n_distinct", pa.int64()),
                ("min_s", pa.string()),
                ("max_s", pa.string()),
            ]
        ),
    )


def _ord(typ: pa.DataType):
    """min/max over canonical strings must use the UNDERLYING order:
    numeric columns compare as ints, strings lexicographically."""
    if pa.types.is_integer(typ) or pa.types.is_timestamp(typ):
        return int
    return str
