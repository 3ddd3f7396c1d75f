"""Driver-style correctness gate, run locally: every ``queries()`` entry
with an ``oracle_sql()`` counterpart is executed at sf0.001 and compared
against DuckDB on row count, sorted column names, and order-insensitive
values (the same comparison shape the driver applies at sf0.01)."""

from __future__ import annotations

import os

import duckdb
import pandas as pd
import pytest

SF_DIR = "/root/testdata/sf0.001"
TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings"
).split()


def _to_pandas(result) -> pd.DataFrame:
    import pyarrow as pa
    import ray.data

    if isinstance(result, ray.data.Dataset):
        return result.to_pandas()
    if isinstance(result, pa.Table):
        return result.to_pandas()
    return result


def _canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
    df = df.sort_values(by=list(df.columns), ignore_index=True)
    return df.reset_index(drop=True)


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    for t in TABLES:
        path = os.path.join(SF_DIR, f"{t}.parquet")
        if os.path.exists(path):
            c.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{path}')")
    return c


def _pairs():
    from doppel_ray import pipelines

    reg = pipelines.registry()
    orc = pipelines.oracles()
    return [(name, reg[name], orc[name]) for name in sorted(orc)]


@pytest.mark.parametrize("name", [p[0] for p in _pairs()])
def test_query_matches_oracle(name, con):
    from doppel_ray import pipelines

    fn = pipelines.registry()[name]
    sql = pipelines.oracles()[name]
    got = _canon(_to_pandas(fn(SF_DIR)))
    want = _canon(con.execute(sql).df())
    assert list(got.columns) == list(want.columns), (
        f"{name}: columns {list(got.columns)} != {list(want.columns)}"
    )
    assert len(got) == len(want), f"{name}: {len(got)} rows != {len(want)}"
    # order-insensitive value equality (numeric tolerance for floats)
    for c in got.columns:
        if pd.api.types.is_float_dtype(got[c]) or pd.api.types.is_float_dtype(want[c]):
            pd.testing.assert_series_equal(
                got[c].astype(float), want[c].astype(float),
                check_names=False, rtol=1e-9, atol=1e-12,
            )
        else:
            assert got[c].astype(str).tolist() == want[c].astype(str).tolist(), (
                f"{name}: column {c} differs"
            )


# -- non-vacuous dedup oracles (VERDICT r1 #5) --------------------------
# sf0.001 (and the driver's sf0.01) documents tables contain ZERO
# duplicate texts, so the dedup oracle rows pass vacuously (0 == 0).
# This fixture copies the documents table with injected duplicate groups
# — including one of 71 members, above the default band_cap=64, so the
# pair-complete clique expansion is exercised against DuckDB.

DUP_QUERIES = [
    "exact_dup_groups",
    "quick_hash_groups",
    "dedup_keep_first",
    "near_dup_pairs_exact",
    "dup_clusters",
    "fingerprint_dup_groups",
    "curation_funnel",
    "dup_rate_by_source",
]

_DUP_GROUPS = [  # (source row, target rows) -> all share source's text
    (0, range(400, 402)),   # group of 3
    (1, range(402, 405)),   # group of 4
    (2, range(405, 475)),   # group of 71 (> band_cap=64)
    (3, range(475, 476)),   # group of 2
]


@pytest.fixture(scope="module")
def dup_sf_dir(tmp_path_factory):
    import pyarrow as pa
    import pyarrow.parquet as pq

    t = pq.read_table(os.path.join(SF_DIR, "documents.parquet"))
    texts = t["text"].to_pylist()
    for src, targets in _DUP_GROUPS:
        for j in targets:
            texts[j] = texts[src]
    i = t.schema.get_field_index("text")
    out = t.set_column(i, "text", pa.array(texts, type=t.schema.field("text").type))
    d = tmp_path_factory.mktemp("dup_sf")
    pq.write_table(out, os.path.join(str(d), "documents.parquet"))
    return str(d)


@pytest.fixture(scope="module")
def dup_con(dup_sf_dir):
    c = duckdb.connect()
    path = os.path.join(dup_sf_dir, "documents.parquet")
    c.execute(f"CREATE VIEW documents AS SELECT * FROM read_parquet('{path}')")
    return c


@pytest.mark.parametrize("name", DUP_QUERIES)
def test_dup_query_matches_oracle_nonvacuously(name, dup_con, dup_sf_dir):
    from doppel_ray import pipelines

    fn = pipelines.registry()[name]
    sql = pipelines.oracles()[name]
    got = _canon(_to_pandas(fn(dup_sf_dir)))
    want = _canon(dup_con.execute(sql).df())
    # the gate must not pass vacuously: the oracle side has real rows
    total_docs = dup_con.execute("SELECT count(*) FROM documents").fetchone()[0]
    if name == "dedup_keep_first":
        assert 0 < len(want) < total_docs
    elif name == "dup_rate_by_source":
        assert want["n_dup_docs"].sum() > 0, (
            "dup_rate_by_source: no duplicated docs — vacuous"
        )
    elif name == "curation_funnel":
        # the ledger always has one row per doc; non-vacuity means the
        # DUPLICATE tier is exercised by the injected groups
        assert (want["status"] == "duplicate").sum() > 0, (
            "curation_funnel: no duplicate-tier rows — vacuous"
        )
    else:
        assert len(want) > 0, f"{name}: oracle returned no rows — vacuous"
    assert list(got.columns) == list(want.columns), name
    assert len(got) == len(want), f"{name}: {len(got)} rows != {len(want)}"
    for c in got.columns:
        if pd.api.types.is_float_dtype(got[c]) or pd.api.types.is_float_dtype(want[c]):
            pd.testing.assert_series_equal(
                got[c].astype(float), want[c].astype(float),
                check_names=False, rtol=1e-9, atol=1e-12,
            )
        else:
            assert got[c].astype(str).tolist() == want[c].astype(str).tolist(), (
                f"{name}: column {c} differs"
            )


# -- keep-best vs keep-first non-vacuity --------------------------------
# near_dedup_keep_best only differs from keep-first when a cluster's
# longest member is NOT its min id; the plain corpora never exercise
# that, so inject a cluster where the HIGHER id is the longer doc.
# The base/target docs MUST (a) be long enough that the appended tail
# keeps exact shingle Jaccard >= tau=0.8, and (b) have no ORGANIC
# near-dup partner in sf0.001 — doc 0, used by an earlier version of
# this fixture, is short (J with its tailed copy = 0.73 < tau) AND
# organically clustered with docs 50/82, which made keep_best drop it
# for the wrong reason while keep_first kept both injected docs.
# Docs 149 and 406 are the longest organically-unclustered ids
# (539/538 shingles; tail adds ~42 -> J ~= 0.93 >= 0.8).

BEST_BASE, BEST_TARGET = 149, 406


@pytest.fixture(scope="module")
def best_sf_dir(tmp_path_factory):
    import re

    import pyarrow as pa
    import pyarrow.parquet as pq

    t = pq.read_table(os.path.join(SF_DIR, "documents.parquet"))
    texts = t["text"].to_pylist()
    texts[BEST_TARGET] = texts[BEST_BASE] + " zq extra tail tokens appended here zq"

    # guard the fixture's own premise: the injected pair IS an edge
    def shingles(s):
        s = re.sub(r"\s+", " ", s.lower()).strip()
        return {s[j : j + 5] for j in range(len(s) - 4)}

    a, b = shingles(texts[BEST_BASE]), shingles(texts[BEST_TARGET])
    j = len(a & b) / len(a | b)
    assert j >= 0.85, f"fixture premise broken: J(base, target) = {j:.3f}"

    i = t.schema.get_field_index("text")
    out = t.set_column(i, "text", pa.array(texts, type=t.schema.field("text").type))
    d = tmp_path_factory.mktemp("best_sf")
    pq.write_table(out, os.path.join(str(d), "documents.parquet"))
    return str(d)


def test_keep_best_prefers_longest_nonvacuously(best_sf_dir):
    from doppel_ray import pipelines

    con = duckdb.connect()
    path = os.path.join(best_sf_dir, "documents.parquet")
    con.execute(f"CREATE VIEW documents AS SELECT * FROM read_parquet('{path}')")

    fn = pipelines.registry()["near_dedup_keep_best"]
    sql = pipelines.oracles()["near_dedup_keep_best"]
    got = _canon(_to_pandas(fn(best_sf_dir)))
    want = _canon(con.execute(sql).df())
    assert got["doc_id"].tolist() == want["doc_id"].tolist()
    kept = set(got["doc_id"].tolist())
    # best (longest) member survives; the min-id member is dropped
    assert BEST_TARGET in kept and BEST_BASE not in kept
    # keep-FIRST on the same corpus makes the opposite call, and both
    # policies agree with keep-first's own oracle
    first = _canon(
        _to_pandas(pipelines.registry()["near_dedup_keep_first"](best_sf_dir))
    )
    want_first = _canon(
        con.execute(pipelines.oracles()["near_dedup_keep_first"]).df()
    )
    assert first["doc_id"].tolist() == want_first["doc_id"].tolist()
    kept_first = set(first["doc_id"].tolist())
    assert BEST_BASE in kept_first and BEST_TARGET not in kept_first


def test_entry_smoke():
    import __ray_entry__ as e

    res = e.entry()
    df = _to_pandas(res)
    assert len(df) >= 0
    assert list(df.columns)


def test_every_query_runs():
    from doppel_ray import pipelines

    for name, fn in pipelines.registry().items():
        df = _to_pandas(fn(SF_DIR))
        assert df is not None, name
