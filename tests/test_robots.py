"""robots.txt parsing + filtering (stages/robots.py)."""

import pyarrow as pa
import ray

from doppel_ray.stages.robots import parse_robots, robots_filter

BODY = """
# comment line
User-agent: googlebot
Disallow: /google-only/

User-agent: *
Disallow: /private/
Disallow: /tmp
Disallow:
Crawl-delay: 10

User-agent: doppelbot
Disallow: /doppel/
"""


class TestParse:
    def test_wildcard_group(self):
        assert parse_robots(BODY) == ["/private/", "/tmp"]

    def test_named_agent_unions_wildcard(self):
        assert parse_robots(BODY, agent="doppelbot") == [
            "/doppel/", "/private/", "/tmp",
        ]
        assert parse_robots(BODY, agent="GoogleBot") == [
            "/google-only/", "/private/", "/tmp",
        ]

    def test_empty_and_commented(self):
        assert parse_robots("") == []
        assert parse_robots("# only comments\n\n") == []
        assert parse_robots("User-agent: *\nDisallow:\n") == []


class TestFilter:
    def test_per_host_prefixes(self, ray_session):
        urls = [
            "https://a.example/private/x",   # dropped (a rule)
            "https://a.example/public/x",    # kept
            "https://b.example/private/x",   # kept (no rule for b)
            "https://a.example/tmpfile",     # dropped (/tmp prefix)
            "not a url",                     # kept (no host -> no rule)
        ]
        ds = ray.data.from_arrow(
            pa.table({"url": pa.array(urls, type=pa.string())})
        )
        rules = {"a.example": ["/private/", "/tmp"]}
        got = {r["url"] for r in robots_filter(ds, rules).take_all()}
        assert got == {
            "https://a.example/public/x",
            "https://b.example/private/x",
            "not a url",
        }

    def test_layout_invariant(self, ray_session):
        urls = [
            f"https://h{i % 3}.example/p{i % 5}/x" for i in range(60)
        ]
        ds = ray.data.from_arrow(
            pa.table({"url": pa.array(urls, type=pa.string())})
        )
        rules = {"h0.example": ["/p0", "/p1"], "h2.example": ["/p4"]}
        a = sorted(r["url"] for r in robots_filter(ds, rules).take_all())
        b = sorted(
            r["url"]
            for r in robots_filter(ds.repartition(7), rules).take_all()
        )
        assert a == b and len(a) < 60
