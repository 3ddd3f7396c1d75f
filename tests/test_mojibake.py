"""Mojibake repair (stages/mojibake.py): per-rule pins, chain-order
safety, counts-before-rewrite, null handling, DuckDB parity."""

from __future__ import annotations

import pandas as pd
import pyarrow as pa
import ray.data as rd

from doppel_ray.stages import mojibake as mj


class TestRules:
    def test_each_rule_repairs(self):
        for bad, good in mj.MOJIBAKE_FIXES:
            arr = pa.array([f"x {bad} y"], type=pa.string())
            assert mj.fix_text(arr).to_pylist() == [f"x {good} y"]
            assert mj.mojibake_count(arr).to_pylist() == [1]

    def test_no_rule_prefixes_a_later_rule(self):
        rules = [b for b, _ in mj.MOJIBAKE_FIXES]
        for i, a in enumerate(rules):
            for b in rules[i + 1 :]:
                assert not b.startswith(a), (a, b)

    def test_clean_text_untouched(self):
        arr = pa.array(["déjà vu — it’s fine", None, ""], type=pa.string())
        fixed = mj.fix_text(arr).to_pylist()
        assert fixed == ["déjà vu — it’s fine", "", ""]
        assert mj.mojibake_count(arr).to_pylist() == [0, 0, 0]

    def test_counts_before_rewrite_sum(self):
        arr = pa.array(["cafÃ© donâ€™t cafÃ©"], type=pa.string())
        assert mj.mojibake_count(arr).to_pylist() == [3]
        assert mj.fix_text(arr).to_pylist() == ["café don’t café"]


class TestStage:
    def test_dataset_stage_and_duckdb_parity(self, ray_session):
        import duckdb

        df = pd.DataFrame(
            {
                "doc_id": [1, 2, 3, 4],
                "text": [
                    "plain text",
                    "don" + mj.MOJIBAKE_FIXES[0][0] + "t cafÃ©",
                    "na" + mj.MOJIBAKE_FIXES[9][0] + "ve",
                    None,
                ],
            }
        )
        got = (
            mj.fix_mojibake(rd.from_pandas(df).repartition(2))
            .to_pandas()
            .sort_values("doc_id", ignore_index=True)
        )
        con = duckdb.connect()
        con.register("t", df.fillna({"text": ""}))
        want = con.execute(
            f"""
            SELECT doc_id, {mj.fixed_sql('text')} AS text_fixed,
                   {mj.count_sql('text')} AS n_mojibake
            FROM t ORDER BY doc_id
            """
        ).df()
        assert got.text_fixed.tolist() == want.text_fixed.tolist()
        assert got.n_mojibake.tolist() == want.n_mojibake.tolist()
        assert got.n_mojibake.tolist() == [0, 2, 1, 0]
