"""Tests for tiered duplicate attribution: planted fixtures hitting all
four tiers, first-tier-wins precedence, layout invariance, and the
kept-set equivalence with the standalone dedup stages."""

from __future__ import annotations

import pyarrow as pa
import ray.data as rd

from doppel_ray.stages import tiered

BASE = (
    "the quick brown fox jumps over the lazy dog while seventeen "
    "astronomers catalog variable stars beyond the western ridge and "
    "four careful editors compare marginal annotations in the archive"
)
TEXTS = [
    BASE,                                      # 0 kept
    BASE,                                      # 1 exact dup of 0
    BASE.upper().replace(" ", "  "),           # 2 normalized dup of 0
    BASE.replace("astronomers", "geologists"),  # 3 near dup of 0
    "a completely different short document about tide tables",  # 4 kept
    BASE.upper().replace(" ", "  "),           # 5 exact dup of 2
    BASE.replace("fox", "cat").replace("dog", "hen"),  # 6 near dup of 0
]
WANT = {
    0: "kept",
    1: "exact",
    2: "normalized",
    3: "near",
    4: "kept",
    5: "exact",
    6: "near",
}


def _ds(texts=TEXTS, parts=None):
    ds = rd.from_arrow(
        pa.table(
            {
                "doc_id": pa.array(range(len(texts)), type=pa.int64()),
                "text": pa.array(texts, type=pa.string()),
            }
        )
    )
    return ds.repartition(parts) if parts else ds


def _run(ds):
    return {r["doc_id"]: r["tier"] for r in tiered.tiered_dedup(ds).take_all()}


class TestTieredDedup:
    def test_planted_fixture_all_tiers(self, ray_session):
        assert _run(_ds()) == WANT

    def test_every_doc_labeled_once(self, ray_session):
        rows = tiered.tiered_dedup(_ds()).take_all()
        ids = sorted(r["doc_id"] for r in rows)
        assert ids == list(range(len(TEXTS)))

    def test_layout_invariant(self, ray_session):
        assert _run(_ds(parts=4)) == WANT

    def test_no_dups_all_kept(self, ray_session):
        texts = [f"{BASE} unique tail marker {i} " + "x" * i for i in range(4)]
        # distinct long texts sharing most shingles would near-dup; use
        # genuinely different docs instead
        texts = [
            "alpha beta gamma delta epsilon zeta eta theta",
            "one two three four five six seven eight nine ten",
            "red orange yellow green blue indigo violet",
            "north south east west up down left right",
        ]
        got = _run(_ds(texts))
        assert set(got.values()) == {"kept"}

    def test_first_tier_wins(self, ray_session):
        # doc 2 is BOTH a normalized dup (of 0) and trivially a near dup;
        # doc 1 is an exact dup and also a normalized/near dup — each
        # must be attributed to the EARLIEST tier.
        got = _run(_ds())
        assert got[1] == "exact" and got[2] == "normalized"

    def test_kept_matches_standalone_near_dedup(self, ray_session):
        # the tier='kept' set must equal: exact keep-first, then
        # normalized keep-first, then near-dedup keep-first — which for
        # this fixture is exactly WANT's kept ids
        kept = {d for d, t in _run(_ds()).items() if t == "kept"}
        assert kept == {d for d, t in WANT.items() if t == "kept"}
