"""Windowed-aggregate and sessionization tests: tumbling-window key
assignment and gap-session semantics vs a per-user reference loop."""

from __future__ import annotations

import datetime as dt

import numpy as np
import pyarrow as pa
import ray.data as rd

from doppel_ray.stages import windows

US = 1_000_000


def _events(rows):
    """rows: (user_id, event_id, minutes_offset)"""
    base = dt.datetime(2026, 1, 1)
    return pa.table(
        {
            "user_id": pa.array([r[0] for r in rows], type=pa.int64()),
            "event_id": pa.array([r[1] for r in rows], type=pa.int64()),
            "ts": pa.array(
                [base + dt.timedelta(minutes=r[2]) for r in rows],
                type=pa.timestamp("us"),
            ),
        }
    )


class TestTumbling:
    def test_window_assignment(self, ray_session):
        t = _events([(1, 1, 0), (1, 2, 59), (1, 3, 60), (1, 4, 125)])
        out = windows.add_tumbling_window(rd.from_arrow(t), every="hour").take_all()
        ws = sorted(r["window_start"].minute == 0 for r in out)
        starts = sorted({r["window_start"].hour for r in out})
        assert all(ws)
        assert starts == [0, 1, 2]


class TestSessionize:
    def test_gap_semantics(self, ray_session):
        rows = [
            (1, 1, 0), (1, 2, 10), (1, 3, 40),   # gap 30 exactly: same session
            (1, 4, 71),                           # gap 31 -> new session
            (2, 5, 0),                            # separate user
            (2, 6, 200),                          # far gap -> session 2
        ]
        out = windows.sessionize(
            rd.from_arrow(_events(rows)), gap_minutes=30.0, num_buckets=4
        ).take_all()
        got = {
            (r["user_id"], r["session_id"]): (
                r["n_events"],
                r["session_start_us"],
                r["session_end_us"],
            )
            for r in out
        }
        base = int(dt.datetime(2026, 1, 1).timestamp()) * US
        assert set(got) == {(1, 1), (1, 2), (2, 1), (2, 2)}
        assert got[(1, 1)][0] == 3
        assert got[(1, 2)][0] == 1
        assert got[(1, 1)][2] - got[(1, 1)][1] == 40 * 60 * US

    def test_vs_reference_loop(self, ray_session):
        rng = np.random.default_rng(5)
        rows = []
        eid = 0
        for u in range(20):
            t = 0
            for _ in range(int(rng.integers(1, 40))):
                t += int(rng.integers(0, 70))
                rows.append((u, eid, t))
                eid += 1
        out = windows.sessionize(
            rd.from_arrow(_events(rows)), gap_minutes=30.0, num_buckets=4
        ).take_all()

        # reference: python loop per user
        want = {}
        by_user: dict[int, list] = {}
        for u, e, m in rows:
            by_user.setdefault(u, []).append((m, e))
        for u, evs in by_user.items():
            evs.sort()
            sid, count, start = 0, 0, None
            prev = None
            for m, e in evs:
                if prev is None or (m - prev) > 30:
                    if count:
                        want[(u, sid)] = count
                    sid += 1
                    count = 0
                count += 1
                prev = m
            want[(u, sid)] = count
        got = {(r["user_id"], r["session_id"]): r["n_events"] for r in out}
        assert got == want

    def test_ties_broken_by_event_id(self, ray_session):
        rows = [(1, 2, 0), (1, 1, 0), (1, 3, 0)]
        out = windows.sessionize(rd.from_arrow(_events(rows)), num_buckets=2).take_all()
        assert len(out) == 1 and out[0]["n_events"] == 3


class TestHoppingWindows:
    def test_each_event_covers_k_windows(self, ray_session):
        rows = [(1, i, off) for i, off in enumerate([0, 7, 14, 29, 61, 200])]
        out = windows.add_hopping_windows(
            rd.from_arrow(_events(rows)), length_minutes=60, hop_minutes=15
        ).take_all()
        assert len(out) == len(rows) * 4
        base = dt.datetime(2026, 1, 1)
        L = 60 * 60 * US
        for r in out:
            ts_us = int(r["ts"].timestamp() * US) if hasattr(r["ts"], "timestamp") else int(
                np.datetime64(r["ts"], "us").astype(np.int64)
            )
            w = r["window_us"]
            assert w <= ts_us < w + L  # window really covers the event
            assert w % (15 * 60 * US) == 0

    def test_window_counts_match_brute_force(self, ray_session):
        rng = np.random.default_rng(7)
        offs = sorted(rng.integers(0, 600, 200).tolist())
        rows = [(1, i, int(o)) for i, o in enumerate(offs)]
        out = windows.add_hopping_windows(
            rd.from_arrow(_events(rows)), length_minutes=60, hop_minutes=15
        ).take_all()
        got: dict[int, int] = {}
        for r in out:
            got[r["window_us"]] = got.get(r["window_us"], 0) + 1
        base_us = int(
            np.datetime64(dt.datetime(2026, 1, 1), "us").astype(np.int64)
        )
        hop, L = 15 * 60 * US, 60 * 60 * US
        want: dict[int, int] = {}
        lo = (base_us // hop) * hop - L
        hi = base_us + 600 * 60 * US + L
        for w in range(lo, hi, hop):
            c = sum(1 for o in offs if w <= base_us + o * 60 * US < w + L)
            if c:
                want[w] = c
        assert got == want


class TestCohortRetention:
    def test_vs_reference_loop(self, ray_session):
        import collections

        rng = np.random.default_rng(7)
        base = dt.datetime(2026, 1, 1)
        rows = []
        eid = 0
        for uid in range(40):
            for _ in range(int(rng.integers(1, 12))):
                rows.append((uid, eid, int(rng.integers(0, 60 * 24 * 20))))
                eid += 1
        t = _events(rows)

        out = windows.cohort_retention(rd.from_arrow(t)).take_all()
        got = {(r["cohort_day"], r["offset_days"]): r["n_users"] for r in out}

        # reference: per-user day sets, first day = cohort
        day_us = 86_400_000_000
        user_days = collections.defaultdict(set)
        ts = t["ts"].cast("int64").to_pylist()
        for uid, d in zip(t["user_id"].to_pylist(), ts):
            user_days[uid].add(d // day_us)
        want = collections.Counter()
        for days in user_days.values():
            first = min(days)
            for d in days:
                want[(first, d - first)] += 1
        assert got == dict(want)

    def test_offset_zero_counts_every_user(self, ray_session):
        t = _events([(1, 1, 0), (1, 2, 30), (2, 3, 60 * 24), (3, 4, 60 * 48)])
        out = windows.cohort_retention(rd.from_arrow(t)).take_all()
        zero = sum(r["n_users"] for r in out if r["offset_days"] == 0)
        assert zero == 3
