"""Deterministic synthetic web-page corpus generator (FIXTURES.md §1).

Produces the ``pages`` table (url, warc_ts, html, text, lang) with known
duplicate structure, mirroring the reference's canonical fixture shape —
3 copies of content A + 2 copies of content B + uniques (reference
internal/finder/finder_test.go:33-73) — scaled up, plus the near-dup /
containment / skew content the north rule requires. A sidecar
``truth_pairs`` table (url_a, url_b, jaccard, kind) records planted ground
truth for the recall harness.

Everything is seeded (default 42); no wall-clock, no external data.
"""

from __future__ import annotations

import os
from dataclasses import dataclass, field

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

_WORDS = (
    "the quick brown fox jumps over lazy dog web page corpus crawl data "
    "duplicate content cluster shingle signature band bucket text html "
    "document engine pipeline stream arrow batch shuffle partition key "
    "index token filter hash group size byte window sample verify match "
    "alpha beta gamma delta epsilon zeta eta theta iota kappa lambda mu"
).split()

_LANGS = ("en", "de", "fr", "es", "und")

BASE_TS_US = 1_767_225_600_000_000  # 2026-01-01T00:00:00Z in microseconds


@dataclass
class SynthSpec:
    """Knobs for corpus shape; defaults follow FIXTURES.md §1."""

    n_unique: int = 350  # singleton majority (~70%)
    exact_cluster_sizes: tuple[int, ...] = (2, 3, 5, 50)
    near_jaccards: tuple[float, ...] = (0.95, 0.9, 0.8, 0.7, 0.5)
    near_pairs_per_level: int = 4
    middle_mutation_pairs: int = 3  # >=24 KiB, differ only at offset ~9216
    size_boundary_lengths: tuple[int, ...] = (
        0, 13, 8191, 8192, 8193, 16383, 16384, 24576,
    )
    n_empty: int = 3
    containment_pairs: int = 4
    skew_frac: float = 0.05  # boilerplate share for LSH hot-band tests
    filter_targets: int = 10  # urls matching exclusion globs/regexes
    doc_words: int = 80  # mean words per ordinary doc
    seed: int = 42


@dataclass
class SynthResult:
    pages: pa.Table
    truth_pairs: pa.Table
    # url -> planted exact-cluster id (for conformance assertions)
    exact_clusters: dict[str, int] = field(default_factory=dict)


def _rand_text(rng: np.random.Generator, n_words: int) -> str:
    idx = rng.integers(0, len(_WORDS), size=max(n_words, 1))
    return " ".join(_WORDS[i] for i in idx)


def _text_of_len(rng: np.random.Generator, n_bytes: int) -> str:
    """ASCII text of exactly n_bytes bytes (so byte == char length)."""
    if n_bytes <= 0:
        return ""
    out = []
    size = 0
    while size < n_bytes:
        w = _WORDS[int(rng.integers(0, len(_WORDS)))]
        out.append(w)
        size += len(w) + 1
    s = " ".join(out)
    return s[:n_bytes] if len(s) >= n_bytes else s + "x" * (n_bytes - len(s))


def _mutate_to_jaccard(rng: np.random.Generator, words: list[str], target: float) -> list[str]:
    """Word-substitution mutation aiming at (approximately) the target
    word-level Jaccard; actual shingle-Jaccard is measured by the harness,
    not assumed."""
    n = len(words)
    # substituting k of n words keeps ~ (n-k)/(n+k) Jaccard
    k = max(1, int(round(n * (1 - target) / (1 + target))))
    out = list(words)
    pos = rng.choice(n, size=min(k, n), replace=False)
    for p in pos:
        out[p] = _WORDS[int(rng.integers(0, len(_WORDS)))] + "q"
    return out


def generate(spec: SynthSpec | None = None) -> SynthResult:
    spec = spec or SynthSpec()
    rng = np.random.default_rng(spec.seed)

    urls: list[str] = []
    texts: list[str] = []
    langs: list[str] = []
    truth: list[tuple[str, str, float, str]] = []
    exact_clusters: dict[str, int] = {}

    def add(url: str, text: str, lang: str | None = None) -> str:
        urls.append(url)
        texts.append(text)
        langs.append(lang or _LANGS[int(rng.integers(0, len(_LANGS)))])
        return url

    # 1. unique singletons
    for i in range(spec.n_unique):
        add(f"https://site{i % 37}.example/p/{i}", _rand_text(rng, spec.doc_words))

    # 2. exact-dup clusters (reference finder_test.go:33-73 shape, scaled)
    cid = 0
    for size in spec.exact_cluster_sizes:
        body = _rand_text(rng, spec.doc_words)
        members = [add(f"https://dup{cid}.example/copy/{j}", body) for j in range(size)]
        for u in members:
            exact_clusters[u] = cid
        for a in range(len(members)):
            for b in range(a + 1, len(members)):
                truth.append((members[a], members[b], 1.0, "exact"))
        cid += 1

    # 3. near-dup pairs at target jaccard levels
    for level in spec.near_jaccards:
        for j in range(spec.near_pairs_per_level):
            base = _rand_text(rng, spec.doc_words * 2).split()
            mut = _mutate_to_jaccard(rng, base, level)
            ua = add(f"https://near.example/{level}/{j}/a", " ".join(base))
            ub = add(f"https://near.example/{level}/{j}/b", " ".join(mut))
            truth.append((ua, ub, level, "near"))

    # 4. middle-mutation pairs: >=24 KiB, identical first/last 8 KiB,
    #    flipped byte at offset ~9216 (reference hasher_test.go:231-317) —
    #    must share quick hash, differ in full hash.
    for j in range(spec.middle_mutation_pairs):
        body = _text_of_len(rng, 24 * 1024)
        mutated = body[:9216] + ("Z" if body[9216] != "Z" else "Y") + body[9217:]
        ua = add(f"https://mid.example/{j}/a", body)
        ub = add(f"https://mid.example/{j}/b", mutated)
        truth.append((ua, ub, 0.99, "middle"))

    # 5. size-boundary texts (reference hasher_test.go:148-227 sizes)
    for n in spec.size_boundary_lengths:
        add(f"https://sizes.example/{n}", _text_of_len(rng, n))

    # 6. empty-text rows (size<=0 => quick hash 0, hasher.go:47-49)
    for j in range(spec.n_empty):
        add(f"https://empty.example/{j}", "")

    # 7. containment pairs: A verbatim substring of B (small + large)
    for j in range(spec.containment_pairs):
        inner_len = 400 if j % 2 == 0 else 33 * 1024
        inner = _text_of_len(rng, inner_len)
        outer = _rand_text(rng, 30) + " " + inner + " " + _rand_text(rng, 30)
        ua = add(f"https://contain.example/{j}/inner", inner)
        ub = add(f"https://contain.example/{j}/outer", outer)
        truth.append((ua, ub, 0.0, "contain"))

    # 8. skew band: ~5% boilerplate-identical shingle sets (LSH hot band)
    n_skew = int(len(urls) * spec.skew_frac)
    boiler = _rand_text(rng, spec.doc_words)
    skew_members = []
    for j in range(n_skew):
        skew_members.append(add(f"https://boiler.example/{j}", boiler, "en"))
    for u in skew_members:
        exact_clusters[u] = cid
    for a in range(len(skew_members)):
        for b in range(a + 1, len(skew_members)):
            truth.append((skew_members[a], skew_members[b], 1.0, "exact"))

    # 9. filter targets: urls matching exclusion globs/regexes
    #    (mirrors filter_test.go:202-381 predicate truth tables)
    for j in range(spec.filter_targets):
        if j % 2 == 0:
            add(f"https://junk.example/tmp/cache/{j}", _rand_text(rng, 20))
        else:
            add(f"https://junk.example/logs/{j}.log", _rand_text(rng, 20))

    n = len(urls)
    ts = pa.array(BASE_TS_US + np.arange(n, dtype=np.int64) * 1_000_000,
                  type=pa.timestamp("us"))
    html = [f"<html><body>{t}</body></html>".encode() for t in texts]
    pages = pa.table(
        {
            "url": pa.array(urls, type=pa.string()),
            "warc_ts": ts,
            "html": pa.array(html, type=pa.binary()),
            "text": pa.array(texts, type=pa.large_string()),
            "lang": pa.array(langs, type=pa.string()),
        }
    )
    truth_pairs = pa.table(
        {
            "url_a": pa.array([t[0] for t in truth]),
            "url_b": pa.array([t[1] for t in truth]),
            "jaccard": pa.array([t[2] for t in truth], type=pa.float64()),
            "kind": pa.array([t[3] for t in truth]),
        }
    )
    return SynthResult(pages=pages, truth_pairs=truth_pairs,
                       exact_clusters=exact_clusters)


def _bench_vocab(rng: np.random.Generator, n_words: int = 4000) -> np.ndarray:
    """Synthetic vocabulary large enough that two random docs have LOW
    shingle Jaccard (a ~90-word vocab makes every random doc a shingle
    near-duplicate of every other, turning LSH bands into mega-groups —
    unrealistic for web text and quadratic in candidate pairs)."""
    letters = np.array(list("abcdefghijklmnopqrstuvwxyz"))
    lens = rng.integers(4, 10, size=n_words)
    return np.array(
        ["".join(letters[rng.integers(0, 26, size=l)]) for l in lens]
    )


def generate_bench_corpus(n_docs: int, seed: int = 42, dup_frac: float = 0.3,
                          near_frac: float = 0.1, doc_words: int = 120,
                          return_families: bool = False):
    """Large flat corpus for throughput benchmarks: ``dup_frac`` of rows are
    exact copies of earlier rows, ``near_frac`` are near-duplicates, rest
    unique. Vectorized generation so sf_bench (~200k docs) builds in seconds.

    ``return_families=True`` additionally returns the planted ground
    truth as an int64 array aligned with the output rows: row i belongs
    to family ``families[i]`` (the index of the base doc it was derived
    from; unique docs are their own singleton family). Derivations are
    exact copies (Jaccard 1.0) or one-word substitutions (char-shingle
    Jaccard ~0.97 at the default 120 words), so within-family pairs are
    the corpus's qualifying near-dup relation at tau <= ~0.95 — the
    truth set for the bench-scale recall audit (`bench.py --recall`).
    The RNG stream is unchanged either way: the corpus is bit-identical
    to the ``return_families=False`` output for the same arguments.
    """
    rng = np.random.default_rng(seed)
    n_base = int(n_docs * (1 - dup_frac - near_frac))
    words = _bench_vocab(rng)
    # base docs: matrix of word indices -> joined strings
    idx = rng.integers(0, len(words), size=(n_base, doc_words))
    base_texts = [" ".join(row) for row in words[idx]]
    texts = list(base_texts)
    n_dup = int(n_docs * dup_frac)
    src = rng.integers(0, n_base, size=n_dup)
    texts.extend(base_texts[s] for s in src)
    n_near = n_docs - len(texts)
    src_n = rng.integers(0, n_base, size=n_near)
    sub_pos = rng.integers(0, doc_words, size=n_near)
    sub_word = rng.integers(0, len(words), size=n_near)
    for s, p, w in zip(src_n, sub_pos, sub_word):
        parts = base_texts[s].split()
        parts[p] = words[w] + "q"
        texts.append(" ".join(parts))
    n = len(texts)
    perm = rng.permutation(n)
    fam = np.concatenate(
        [np.arange(n_base, dtype=np.int64), src.astype(np.int64),
         src_n.astype(np.int64)]
    )[perm]
    texts = [texts[i] for i in perm]
    urls = [f"https://bench.example/{i}" for i in range(n)]
    ts = pa.array(BASE_TS_US + np.arange(n, dtype=np.int64) * 1_000_000,
                  type=pa.timestamp("us"))
    langs = pa.array(np.array(_LANGS)[rng.integers(0, len(_LANGS), size=n)])
    html = [b""] * n  # html payload irrelevant for throughput of text dedup
    table = pa.table(
        {
            "url": pa.array(urls),
            "warc_ts": ts,
            "html": pa.array(html, type=pa.binary()),
            "text": pa.array(texts, type=pa.large_string()),
            "lang": langs,
        }
    )
    if return_families:
        return table, fam
    return table


def write_corpus(table: pa.Table, out_dir: str, n_files: int = 8) -> list[str]:
    """Write the corpus as several parquet part files (so reads parallelize
    like a real multi-shard corpus). Returns the file paths."""
    os.makedirs(out_dir, exist_ok=True)
    n = table.num_rows
    paths = []
    step = max(1, (n + n_files - 1) // n_files)
    for i, start in enumerate(range(0, n, step)):
        part = table.slice(start, step)
        path = os.path.join(out_dir, f"part-{i:05d}.parquet")
        pq.write_table(part, path)
        paths.append(path)
    return paths
