"""Tests for integer PageRank: brute-force reference parity, broadcast
== distributed regime equivalence, layout invariance, dangling-node and
parameter validation, empty input."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pytest
import ray.data as rd

from doppel_ray.stages import graph

SCALE = 1_000_000


def _edges_ds(edges, parts=None):
    src = pa.array([e[0] for e in edges], type=pa.int64())
    dst = pa.array([e[1] for e in edges], type=pa.int64())
    ds = rd.from_arrow(pa.table({"src": src, "dst": dst}))
    return ds.repartition(parts) if parts else ds


def _reference(edges, num_iters, scale=SCALE, dn=85, dd=100):
    nodes = sorted({v for e in edges for v in e})
    od = {v: 0 for v in nodes}
    for s, _ in edges:
        od[s] += 1
    base = ((dd - dn) * scale) // dd
    r = {v: scale for v in nodes}
    for _ in range(num_iters):
        s = {v: 0 for v in nodes}
        for a, b in edges:
            s[b] += r[a] // od[a]
        r = {v: base + (dn * s[v]) // dd for v in nodes}
    return r


def _ring_with_chords(n=40):
    """Every node links to its successor and to 3 hops ahead — no
    dangling nodes, uneven in-degree once chords collide."""
    edges = []
    for v in range(n):
        edges.append((v, (v + 1) % n))
        edges.append((v, (v * 3 + 1) % n))
    return edges


class TestPageRank:
    def test_matches_reference(self, ray_session):
        edges = _ring_with_chords()
        got = {
            r["node"]: r["rank"]
            for r in graph.pagerank(_edges_ds(edges), num_iters=4).take_all()
        }
        assert got == _reference(edges, 4)

    def test_multi_edges_counted(self, ray_session):
        # duplicate edge doubles both the out-degree and the contribution
        edges = [(0, 1), (0, 1), (1, 0)]
        got = {
            r["node"]: r["rank"]
            for r in graph.pagerank(_edges_ds(edges), num_iters=3).take_all()
        }
        assert got == _reference(edges, 3)

    def test_broadcast_equals_distributed(self, ray_session):
        edges = _ring_with_chords(60)
        kw = dict(num_iters=3, num_buckets=8)
        bc = {
            r["node"]: r["rank"]
            for r in graph.pagerank(
                _edges_ds(edges), broadcast_limit=10_000, **kw
            ).take_all()
        }
        dist = {
            r["node"]: r["rank"]
            for r in graph.pagerank(
                _edges_ds(edges), broadcast_limit=1, **kw
            ).take_all()
        }
        assert bc == dist == _reference(edges, 3)

    def test_layout_invariant(self, ray_session):
        edges = _ring_with_chords(50)
        a = {
            r["node"]: r["rank"]
            for r in graph.pagerank(_edges_ds(edges, parts=1), num_iters=2).take_all()
        }
        b = {
            r["node"]: r["rank"]
            for r in graph.pagerank(_edges_ds(edges, parts=7), num_iters=2).take_all()
        }
        assert a == b

    def test_rank_mass_sane(self, ray_session):
        # uniform ring: every node keeps exactly the initial rank
        edges = [(v, (v + 1) % 10) for v in range(10)]
        got = graph.pagerank(_edges_ds(edges), num_iters=5).take_all()
        assert all(r["rank"] == SCALE for r in got)

    def test_dangling_raises_broadcast(self, ray_session):
        with pytest.raises(ValueError, match="dangling"):
            graph.pagerank(_edges_ds([(0, 1)]), num_iters=1)

    def test_dangling_raises_distributed(self, ray_session):
        with pytest.raises(ValueError, match="dangling"):
            graph.pagerank(
                _edges_ds([(0, 1)]), num_iters=1, broadcast_limit=1
            )

    def test_empty_edges(self, ray_session):
        out = graph.pagerank(_edges_ds([]), num_iters=2)
        assert out.count() == 0

    def test_validation(self, ray_session):
        ds = _edges_ds([(0, 1), (1, 0)])
        with pytest.raises(ValueError):
            graph.pagerank(ds, num_iters=0)
        with pytest.raises(ValueError):
            graph.pagerank(ds, damp_num=100, damp_den=100)
        with pytest.raises(ValueError):
            graph.pagerank(ds, scale=10)
        with pytest.raises(ValueError, match="non-negative"):
            graph.pagerank(_edges_ds([(-1, 0), (0, -1)]), num_iters=1)


def _reference_trust(edges, seeds, num_iters, scale=SCALE, dn=85, dd=100):
    nodes = sorted({v for e in edges for v in e})
    seeds = set(seeds)
    od = {v: 0 for v in nodes}
    for s, _ in edges:
        od[s] += 1
    base = ((dd - dn) * scale) // dd
    r = {v: (scale if v in seeds else 0) for v in nodes}
    for _ in range(num_iters):
        s = {v: 0 for v in nodes}
        for a, b in edges:
            s[b] += r[a] // od[a]
        r = {
            v: (base if v in seeds else 0) + (dn * s[v]) // dd
            for v in nodes
        }
    return r


class TestTrustRank:
    def test_matches_reference(self, ray_session):
        edges = _ring_with_chords(30)
        seeds = [0, 7, 13]
        got = {
            r["node"]: r["rank"]
            for r in graph.pagerank(
                _edges_ds(edges, 4), num_iters=4, seeds=seeds
            ).take_all()
        }
        assert got == _reference_trust(edges, seeds, 4)

    def test_broadcast_equals_distributed(self, ray_session):
        edges = _ring_with_chords(25)
        seeds = [2, 11]
        a = {
            r["node"]: r["rank"]
            for r in graph.pagerank(
                _edges_ds(edges, 3), num_iters=3, seeds=seeds
            ).take_all()
        }
        b = {
            r["node"]: r["rank"]
            for r in graph.pagerank(
                _edges_ds(edges, 3), num_iters=3, seeds=seeds,
                broadcast_limit=0,
            ).take_all()
        }
        assert a == b

    def test_unreachable_nodes_stay_zero(self, ray_session):
        # two disjoint 3-cycles; seeds only in the first
        edges = [(0, 1), (1, 2), (2, 0), (10, 11), (11, 12), (12, 10)]
        got = {
            r["node"]: r["rank"]
            for r in graph.pagerank(
                _edges_ds(edges), num_iters=5, seeds=[0]
            ).take_all()
        }
        assert got[10] == got[11] == got[12] == 0
        assert got[0] > 0 and got[1] > 0 and got[2] > 0

    def test_empty_seeds_raise(self, ray_session):
        with pytest.raises(ValueError, match="seeds"):
            graph.pagerank(_edges_ds([(0, 1), (1, 0)]), seeds=[])
