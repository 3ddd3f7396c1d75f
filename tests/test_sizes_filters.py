"""Size-string parsing (reference filter_test.go:440-543 table), byte
formatting, and exclusion-filter truth tables
(filter_test.go:202-381 analogs reinterpreted for urls)."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest
import ray.data as rd

from doppel_ray.functions.sizes import SizeParseError, format_bytes, parse_size
from doppel_ray.stages import filters


class TestParseSize:
    # the reference's exact test table (filter_test.go:440-523)
    OK = [
        ("", 0), ("0", 0), ("1", 1), ("1024", 1024),
        ("100B", 100), ("  100b", 100), ("100 B", 100), ("+100b", 100),
        ("1KB", 1000), ("\t1kb", 1000), ("1 KB", 1000), ("2KB  ", 2000),
        ("1.5KB", 1500),
        ("1KiB", 1024), ("1kib", 1024), ("2KiB", 2048), ("1.5KiB", 1536),
        ("1MB", 10**6), ("1mb", 10**6), ("10MB", 10**7), ("1.5MB", 1500000),
        ("1MiB", 1048576), ("1mib", 1048576), ("10MiB \t", 10485760),
        ("1GB", 10**9), ("1gb", 10**9), ("2.5GB", 2500000000),
        ("  1GiB\t ", 1073741824), ("1gib", 1073741824),
        ("1TB", 10**12), ("1tb", 10**12),
        ("1TiB", 1099511627776), ("1tib", 1099511627776),
        ("-1", 0), ("-10gb", 0), ("-mx", 0),
    ]
    ERR = [
        "10000000eib", "100000000000 GB",
        " ", "\v", "abc", "1XB", "1.5.5MB", "MB", "1.5.5", "1+2",
        "+", "-", ".", "12..", "....", "0x1",
    ]

    @pytest.mark.parametrize("s,want", OK)
    def test_ok(self, s, want):
        assert parse_size(s) == want

    @pytest.mark.parametrize("s", ERR)
    def test_err(self, s):
        with pytest.raises(SizeParseError):
            parse_size(s)


class TestFormatBytes:
    # formatter.go:97-110 semantics
    @pytest.mark.parametrize(
        "n,want",
        [
            (0, "0 B"), (999, "999 B"), (1000, "1.0 KB"), (1500, "1.5 KB"),
            (1000000, "1.0 MB"), (1500000, "1.5 MB"),
            (2500000000, "2.5 GB"), (10**12, "1.0 TB"),
        ],
    )
    def test_format(self, n, want):
        assert format_bytes(n) == want


class TestBuildConfig:
    def test_negative_sizes_clamped(self):
        fc = filters.build_filter_config(min_size=-5, max_size=-1)
        assert fc.min_size == 0 and fc.max_size == 0

    def test_min_gt_max_errors(self):
        with pytest.raises(filters.FilterConfigError):
            filters.build_filter_config(min_size=100, max_size=10)

    def test_invalid_regex_errors(self):
        with pytest.raises(filters.FilterConfigError):
            filters.build_filter_config(exclude_file_regex="[unclosed")

    def test_comma_parsing(self):
        fc = filters.build_filter_config(exclude_dirs=" a , b ,, c ")
        assert fc.exclude_dirs == ["a", "b", "c"]


class TestPredicateTruthTables:
    def test_exclude_dir_glob_basename(self):
        fc = filters.build_filter_config(exclude_dirs="node_modules,.git")
        assert fc.should_exclude_dir("/proj/node_modules")
        assert fc.should_exclude_dir("/a/b/.git")
        assert not fc.should_exclude_dir("/proj/src")

    def test_exclude_dir_regex(self):
        fc = filters.build_filter_config(exclude_dir_regex=r"^cache.*")
        assert fc.should_exclude_dir("/x/cache01")
        assert not fc.should_exclude_dir("/x/mycache")

    def test_exclude_file_size_window(self):
        fc = filters.build_filter_config(min_size=100, max_size=400)
        assert fc.should_exclude_file("/f", 50)
        assert fc.should_exclude_file("/f", 500)
        assert not fc.should_exclude_file("/f", 250)

    def test_exact_size_when_min_eq_max(self):
        fc = filters.build_filter_config(min_size=100, max_size=100)
        assert not fc.should_exclude_file("/f", 100)
        assert fc.should_exclude_file("/f", 101)
        assert fc.should_exclude_file("/f", 99)

    def test_exclude_file_glob_does_not_cross_slash(self):
        fc = filters.build_filter_config(exclude_files="*.log")
        assert fc.should_exclude_file("/logs/app.log", 10)
        # Go filepath.Match: '*' can't cross '/', so full-path match fails
        # but basename match still hits
        assert fc.should_exclude_file("a.log", 10)
        assert not fc.should_exclude_file("/logs/app.txt", 10)

    def test_exclude_file_regex_full_path(self):
        fc = filters.build_filter_config(exclude_file_regex=r"/tmp/")
        assert fc.should_exclude_file("https://x.example/tmp/cache/1", 10)
        assert not fc.should_exclude_file("https://x.example/data/1", 10)


class TestVectorizedStage:
    def _corpus(self):
        return rd.from_arrow(
            pa.table(
                {
                    "url": [
                        "https://a.example/data/page1",
                        "https://a.example/tmp/cache/3",
                        "https://a.example/logs/app.log",
                        "https://a.example/data/tiny",
                        "https://a.example/node_modules/pkg/idx",
                    ],
                    "text": pa.array(
                        ["x" * 200, "x" * 200, "x" * 200, "x" * 10, "x" * 200],
                        type=pa.large_string(),
                    ),
                }
            )
        )

    def test_filters_match_scalar_predicates(self):
        fc = filters.build_filter_config(
            exclude_dirs="tmp,node_modules",
            exclude_files="*.log",
            min_size=100,
        )
        out = sorted(
            r["url"] for r in filters.apply_filters(self._corpus(), fc).take_all()
        )
        assert out == ["https://a.example/data/page1"]

    def test_empty_config_keeps_all(self):
        fc = filters.build_filter_config()
        assert filters.apply_filters(self._corpus(), fc).count() == 5

    def test_synth_filter_targets(self, pages_ds):
        # FIXTURES.md: junk urls under /tmp/ and *.log basenames
        fc = filters.build_filter_config(
            exclude_dirs="tmp", exclude_file_regex=r"\.log$"
        )
        kept = [r["url"] for r in filters.apply_filters(pages_ds, fc).take_all()]
        assert not any("junk.example" in u for u in kept)

    def test_preset_unknown_is_empty(self):
        fc = filters.get_preset_config("nope")
        assert fc.min_size == 0 and not fc.exclude_dirs

    def test_preset_dev(self):
        fc = filters.get_preset_config("dev")
        assert fc.min_size == 100
        assert "node_modules" in fc.exclude_dirs
        assert fc.should_exclude_file("x.tmp", 500)
