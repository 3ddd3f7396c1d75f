"""Curation funnel stage (stages/curation.py): status partition,
gate precedence, dedup among survivors only, layout invariance."""

import numpy as np
import pyarrow as pa
import ray

from doppel_ray.stages.curation import funnel_ledger


def _ds(rows, parts=1):
    t = pa.table(
        {
            "doc_id": pa.array([r[0] for r in rows], type=pa.int64()),
            "text": pa.array([r[1] for r in rows], type=pa.string()),
            "blocked": pa.array([r[2] for r in rows], type=pa.bool_()),
        }
    )
    ds = ray.data.from_arrow(t)
    return ds.repartition(parts) if parts > 1 else ds


#: weights: score == +1 per token ("bad" docs are EMPTY -> score 0 < 1)
W = np.ones(64, dtype=np.int64)

ROWS = [
    (1, "dup text here", False),
    (2, "dup text here", False),   # duplicate of 1
    (3, "dup text here", True),    # blocked wins over duplicate
    (4, "", False),                # low quality (0 tokens < bias)
    (5, "unique words", False),    # kept
    (6, "dup text here", False),   # duplicate of 1
]


def _run(parts=1):
    got = funnel_ledger(_ds(ROWS, parts), W, bias=1).take_all()
    return {r["doc_id"]: r["status"] for r in got}


class TestFunnelLedger:
    def test_statuses_and_precedence(self, ray_session):
        st = _run()
        assert st == {
            1: "kept",
            2: "duplicate",
            3: "blocked",       # never reaches scoring or dedup
            4: "low_quality",
            5: "kept",
            6: "duplicate",
        }

    def test_partition_property(self, ray_session):
        st = _run()
        assert sorted(st) == [r[0] for r in sorted(ROWS)]

    def test_blocked_doc_excluded_from_dedup(self, ray_session):
        # if doc 3 reached the dedup gate it would change nothing here
        # (min id still 1) — so make the BLOCKED doc the min id: its
        # exclusion must promote doc 1 to "kept"
        rows = [(0, "dup text here", True)] + ROWS
        got = funnel_ledger(_ds(rows), W, bias=1).take_all()
        st = {r["doc_id"]: r["status"] for r in got}
        assert st[0] == "blocked"
        assert st[1] == "kept"

    def test_layout_invariant(self, ray_session):
        assert _run() == _run(parts=5)
