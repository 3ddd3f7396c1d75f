"""PII redaction (stages/pii.py): known-string pins per class, chain
order, counts-before-rewrite, nulls, and Dataset-level wiring."""

import pyarrow as pa
import ray

from doppel_ray.stages import pii


def _arr(*texts):
    return pa.array(list(texts), type=pa.string())


class TestRedactText:
    def test_email(self):
        got = pii.redact_text(_arr("mail bob.smith+x@sub.example.org now"))
        assert got[0].as_py() == "mail <EMAIL> now"

    def test_ssn_id(self):
        got = pii.redact_text(_arr("ssn 123-45-6789."))
        assert got[0].as_py() == "ssn <ID>."

    def test_phone_us_and_intl(self):
        got = pii.redact_text(
            _arr("call 555-123-4567 or 555.123.4567 or +441234567890")
        )
        assert got[0].as_py() == "call <PHONE> or <PHONE> or <PHONE>"

    def test_ipv4(self):
        got = pii.redact_text(_arr("from 10.2.0.77, ok"))
        assert got[0].as_py() == "from <IP>, ok"

    def test_id_not_eaten_by_phone(self):
        # 3-2-4 (id) and 3-3-4 (phone) are disjoint; both survive
        got = pii.redact_text(_arr("a 111-22-3333 b 111-222-3333"))
        assert got[0].as_py() == "a <ID> b <PHONE>"

    def test_plain_text_unchanged(self):
        s = "no pii here, just words and 42 numbers"
        assert pii.redact_text(_arr(s))[0].as_py() == s

    def test_null_passthrough(self):
        got = pii.redact_text(pa.array([None, "x@y.io"], type=pa.string()))
        assert got[0].as_py() is None
        assert got[1].as_py() == "<EMAIL>"


class TestCounts:
    def test_counts_before_rewrite(self):
        t = _arr("a@b.co c@d.io 1.2.3.4 call 555-123-4567 ssn 123-45-6789")
        c = pii.pii_counts(t)
        assert c["n_email"][0].as_py() == 2
        assert c["n_ip"][0].as_py() == 1
        assert c["n_phone"][0].as_py() == 1
        assert c["n_id"][0].as_py() == 1

    def test_zero_counts(self):
        c = pii.pii_counts(_arr("clean text"))
        assert all(v[0].as_py() == 0 for v in c.values())


class TestDatasetWiring:
    def test_redact_pii(self, ray_session):
        ds = ray.data.from_arrow(
            pa.table(
                {
                    "doc_id": pa.array([1, 2], type=pa.int64()),
                    "text": _arr("mail a@b.co", "clean"),
                }
            )
        )
        rows = sorted(
            pii.redact_pii(ds).take_all(), key=lambda r: r["doc_id"]
        )
        assert rows[0]["text_redacted"] == "mail <EMAIL>"
        assert rows[0]["n_email"] == 1
        assert rows[1]["text_redacted"] == "clean"
        assert rows[1]["n_email"] == 0
        # original column preserved
        assert rows[0]["text"] == "mail a@b.co"

    def test_layout_invariant(self, ray_session):
        t = pa.table(
            {
                "doc_id": pa.array(range(40), type=pa.int64()),
                "text": pa.array(
                    [f"u{i}@m.io ip 10.0.0.{i}" for i in range(40)],
                    type=pa.string(),
                ),
            }
        )
        a = sorted(map(str, pii.redact_pii(ray.data.from_arrow(t)).take_all()))
        b = sorted(
            map(
                str,
                pii.redact_pii(
                    ray.data.from_arrow(t).repartition(7)
                ).take_all(),
            )
        )
        assert a == b


class TestSqlEmitters:
    def test_sql_matches_arrow(self):
        import duckdb

        texts = [
            "mail bob@x.example.org ssn 123-45-6789",
            "call 555.123.4567 from 192.168.0.1 and +4912345678",
            "nothing here",
            "edge a@b.io1.2.3.4",  # adjacent matches
        ]
        con = duckdb.connect()
        con.execute(
            "CREATE TABLE v AS SELECT * FROM (VALUES "
            + ",".join(f"('{t}')" for t in texts)
            + ") AS t(s)"
        )
        want = con.execute(
            f"SELECT {pii.redacted_sql('s')}, "
            + ", ".join(
                pii.count_sql("s", n) for n, _, _ in pii.PII_PASSES
            )
            + " FROM v"
        ).fetchall()
        got_text = pii.redact_text(_arr(*texts))
        got_counts = pii.pii_counts(_arr(*texts))
        for i, row in enumerate(want):
            assert got_text[i].as_py() == row[0]
            for j, (n, _, _) in enumerate(pii.PII_PASSES):
                assert got_counts[f"n_{n}"][i].as_py() == row[1 + j]
