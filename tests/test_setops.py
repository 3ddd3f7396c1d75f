"""Unit tests for distributed set algebra (stages/setops.py): INTERSECT /
EXCEPT / UNION distinct rows and overlap cardinalities."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest
import ray.data

from doppel_ray.stages.setops import set_cardinalities, set_op_rows, tag_side


def _mk(seed: int = 5):
    rng = np.random.default_rng(seed)
    a = pd.DataFrame({"v": [f"t{int(i)}" for i in rng.integers(0, 300, 2000)]})
    b = pd.DataFrame({"v": [f"t{int(i)}" for i in rng.integers(150, 450, 2000)]})
    ta = tag_side(ray.data.from_pandas(a).repartition(4), 1, value_col="v")
    tb = tag_side(ray.data.from_pandas(b).repartition(3), 2, value_col="v")
    return a, b, ta.union(tb)


def test_set_op_rows_match_python_sets(ray_session):
    a, b, tagged = _mk()
    sa, sb = set(a["v"]), set(b["v"])
    for mode, want in [
        ("intersect", sa & sb),
        ("except", sa - sb),
        ("union", sa | sb),
    ]:
        got = set_op_rows(tagged, mode).to_pandas()["v"]
        assert len(got) == len(set(got)), f"{mode}: duplicate outputs"
        assert set(got) == want, mode


def test_set_cardinalities_match_python_sets(ray_session):
    a, b, tagged = _mk(9)
    sa, sb = set(a["v"]), set(b["v"])
    c = set_cardinalities(tagged)
    assert c == {
        "n_a": len(sa),
        "n_b": len(sb),
        "n_common": len(sa & sb),
        "n_union": len(sa | sb),
    }


def test_repeated_values_within_side_count_once(ray_session):
    ta = tag_side(
        ray.data.from_items([{"v": "x"}] * 50 + [{"v": "y"}]), 1, value_col="v"
    )
    tb = tag_side(ray.data.from_items([{"v": "x"}] * 7), 2, value_col="v")
    c = set_cardinalities(ta.union(tb))
    assert c == {"n_a": 2, "n_b": 1, "n_common": 1, "n_union": 2}


def test_invalid_args():
    ds = ray.data.from_items([{"v": "x"}])
    with pytest.raises(ValueError):
        tag_side(ds, 3, value_col="v")
    with pytest.raises(ValueError):
        set_op_rows(tag_side(ds, 1, value_col="v"), "minus")
