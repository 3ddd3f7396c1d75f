"""MinHash/LSH near-duplicate detection as a Ray Data pipeline.

Pipeline (SURVEY.md §7.3 step 5):

    pages --map_batches(sign: minhash + band keys)--> (url, band_key) rows
          --bucketed groupby(band_key)--> candidate pairs (hot bands capped)
          --dedupe--> --map_batches(verify: exact Jaccard)--> edges >= tau

Physical design notes (measured, not guessed — see BASELINE.md):
* The signer is a plain function whose permutation matrix is built once
  per worker process via an lru_cache keyed on (num_perm, seed). An actor
  pool (the original design, mirroring the reference's per-worker hasher
  reuse at finder.go:163-166) was measured strictly slower here: the
  state is two 1 KiB arrays — pool spin-up latency and scheduling
  rigidity cost more than they save. ``MinHashSigner`` (the callable
  class) is kept for callers that add genuinely heavy state.
* Candidate-pair emission uses ``bucketed_group_apply`` (hash-bucket the
  band key, pandas-resolve groups inside each bucket): per-group
  ``map_groups`` costs one Python call per band (~1 per doc x bands) and
  measured 30x slower.
* Skew (north rule): a band group larger than ``band_cap`` emits a sorted
  ring (m pairs) instead of all O(m^2) — connectivity for clustering is
  preserved and the ``dropped`` column carries the pruned-pair count (no
  silent truncation). Mega-bands are boilerplate/exact dups in practice,
  already captured by the exact cascade.
* Pair-complete contracts (``verify_mode="exact"`` or threshold >= 1.0):
  the verified relation is an EQUIVALENCE (content equality / shingle-set
  equality), so the complete answer is the full clique over each
  connected component. Hot-band rings are ordered by a per-doc
  equivalence key (content hash / set hash) so every equivalence class
  stays connected through verification even when a band group mixes
  classes, and ``_expand_cliques`` restores the full O(m^2) relation
  afterward (80 identical docs -> 3160 pairs, not a 79-edge ring).
* Verification: candidate docs are a small subset of the corpus; their
  exact shingle sets are computed distributed, then broadcast via
  ``ray.put`` for verification in ``map_batches``. Scale path (documented
  assumption: candidate sets fit one node's RAM): replace the broadcast
  with a bucketed two-pass hash join on hash(url) — stage boundaries
  unchanged.
"""

from __future__ import annotations

import functools
from dataclasses import dataclass

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

import ray
import ray.data
from ray.data import Dataset

from doppel_ray.functions import text as T
from doppel_ray.stages.exact import bucketed_group_apply, semi_filter

PAIRS_SCHEMA = pa.schema(
    [("url_a", pa.string()), ("url_b", pa.string()), ("dropped", pa.int64())]
)

EDGES_SCHEMA = pa.schema(
    [
        ("url_a", pa.string()),
        ("url_b", pa.string()),
        ("similarity", pa.float64()),
        ("kind", pa.string()),
    ]
)


@dataclass(frozen=True)
class MinHashConfig:
    num_perm: int = 128
    bands: int = 32          # rows = num_perm // bands = 4
    shingle_n: int = 5       # char n-gram width (bytes of normalized text)
    threshold: float = 0.8   # exact-Jaccard dup threshold tau
    band_cap: int = 64       # max band-group size emitting all pairs
    seed: int = 42
    normalize: bool = True   # lowercase+collapse-ws before shingling
    # "jaccard": exact set-Jaccard >= threshold (near-dup semantics).
    # "exact": byte-identical text (content-hash equality) — note that
    # set-Jaccard 1.0 does NOT imply identical text (repeated shingles
    # vanish in the set), so exact dedup must compare content hashes.
    verify_mode: str = "jaccard"
    num_buckets: int = 64    # band-key shuffle buckets (~2-4x total CPUs)
    batch_size: int = 2048
    # "oph" (default): one-permutation hashing + rotation densification —
    # one hash pass instead of num_perm, ~30x cheaper signing; capture
    # statistics pinned by the recall harness. "classic": the textbook
    # num_perm multiply-add permutation kernel (kept for A/B checks).
    kernel: str = "oph"
    # collapse identical texts to one representative before
    # signing/banding/verification and restore the full pair relation by
    # distributed expansion afterward (stages/prune.py) — identical
    # texts have identical shingle sets, so sim(member, x) ==
    # sim(rep, x) and the expansion is exact. Kills the exact-dup
    # mega-clique + redundant-verify cost (30-50% of real web corpora).
    prune_exact: bool = True
    # measured exact-dup fraction below which the prune's class-resolve
    # shuffle + anti-join are SKIPPED (they'd cost more than the signing
    # they save). The fraction comes from a KMV distinct-count sketch
    # over the raw-text hashes — one narrow scan, no shuffle, no driver
    # bound (VERDICT r2 #1).
    prune_min_dup_fraction: float = 0.05
    # raw candidate-pair count below which the driver collects + dedupes
    # the pair stream directly (vectorized pandas) instead of paying a
    # dedicated bucketed dedupe shuffle first; between this and
    # driver_verify_limit the shuffle dedupe still runs before collect
    dedupe_collect_limit: int = 2_000_000
    # rep-edge + class-member count above which pair-complete clique
    # expansion switches from the driver union-find to the fully
    # distributed label-propagation + per-component clique emission
    # (ADVICE r2 medium / VERDICT r2 #8)
    clique_driver_edge_limit: int = 2_000_000
    # signature row count (docs x bands, narrow url+int64 rows) below
    # which pair emission runs on the driver: one vectorized
    # _emit_pairs_bucket call over the collected rows instead of a
    # band-count shuffle + band sort. 30M rows ~= 600k docs at the
    # default 32 bands ~= under a GB on the driver — comfortably inside
    # the regime where the driver also collects the pair stream;
    # scale_mode=True never takes this branch.
    sig_rows_collect_limit: int = 30_000_000
    # candidate-doc count below which the verify lookup is broadcast via
    # ray.put and the pair loop runs distributed (fastest when small)
    broadcast_limit: int = 20000
    # candidate-doc count below which the lookup is computed distributed
    # but kept driver-local and pairs verified on the driver (C-speed
    # loop); above this the fully-distributed routed bucketed join runs
    # (no single-node bound)
    driver_verify_limit: int = 1_000_000
    # hot-band skew strategy: False (default) = ring-cap (connectivity
    # kept, O(m) pairs per hot band, dropped counts surfaced); True =
    # EXPLICIT SALTING — count pass finds bands > band_cap, their rows
    # re-key to (band, sip64(url) % n_salts) so a mega-band spreads over
    # n_salts shuffle groups, each emitting its full clique; subgroup
    # minima are ringed afterwards so clustering is unchanged
    salt_hot_bands: bool = False
    n_salts: int = 16
    # True = NO driver-side data paths at all: bucketed distributed pair
    # dedupe + two-pass distributed hash-join verification. Slightly
    # slower at small scale (extra shuffles) but every stage's cost
    # parallelizes — the configuration the N->4N scaling criterion and
    # true multi-node runs use. None (default) = AUTO: the candidate
    # pair list is materialized + counted and the fully-distributed
    # path engages when it exceeds ``driver_verify_limit`` — no caller
    # flag needed at scale.
    scale_mode: bool | None = None
    # None = auto: pair-complete clique expansion engages when the
    # verified relation is an equivalence (verify_mode "exact" or
    # threshold >= 1.0). Explicit False opts out (ring-connectivity
    # only); explicit True forces it.
    pair_complete: bool | None = None

    @classmethod
    def tuned(cls, threshold: float, num_perm: int = 128, **kw) -> "MinHashConfig":
        """Config with ``bands`` auto-chosen for ``threshold`` by
        `tune_bands` (S-curve recall floor + minimal expected
        false-candidate mass). Any other field passes through ``kw``."""
        bands, _ = tune_bands(threshold, num_perm)
        return cls(
            num_perm=num_perm, bands=bands, threshold=threshold, **kw
        )

    @property
    def rows_per_band(self) -> int:
        return self.num_perm // self.bands

    @property
    def is_pair_complete(self) -> bool:
        if self.pair_complete is not None:
            return self.pair_complete
        return self.verify_mode == "exact" or self.threshold >= 1.0


def lsh_candidate_probability(
    s: float | np.ndarray, bands: int, rows: int
) -> float | np.ndarray:
    """P[a pair with Jaccard ``s`` shares >= 1 LSH band] for a banded
    signature with ``bands`` bands of ``rows`` rows: 1 - (1 - s^r)^b
    (the S-curve; Leskovec/Rajaraman/Ullman, Mining of Massive
    Datasets, ch. 3.4)."""
    s = np.asarray(s, dtype=np.float64)
    out = -np.expm1(bands * np.log1p(-(s**rows)))
    return float(out) if out.ndim == 0 else out


def tune_bands(
    threshold: float,
    num_perm: int = 128,
    *,
    min_recall: float = 0.99,
) -> tuple[int, int]:
    """Pick ``(bands, rows)`` for a target Jaccard ``threshold``: among
    the divisor splits of ``num_perm``, keep those whose CANDIDATE
    recall at s = threshold is >= ``min_recall`` (verification is exact
    Jaccard downstream, so banding recall is the only loss term), and of
    those return the one minimizing the expected false-candidate mass
    ``integral_0^threshold P(s) ds`` under a uniform similarity prior —
    i.e. the cheapest-to-verify configuration that still meets the
    recall floor. Falls back to the highest-recall split if none meets
    the floor (tiny num_perm), so callers always get a usable config.

    >>> tune_bands(0.8, 128)[0] * tune_bands(0.8, 128)[1] == 128
    True
    """
    if not 0.0 < threshold < 1.0:
        raise ValueError(f"threshold must be in (0, 1), got {threshold}")
    if num_perm < 2:
        raise ValueError(f"num_perm must be >= 2, got {num_perm}")
    splits = [
        (b, num_perm // b)
        for b in range(1, num_perm + 1)
        if num_perm % b == 0 and num_perm // b >= 1
    ]
    grid = np.linspace(0.0, threshold, 513)
    best = None  # (fp_mass, -recall, bands, rows)
    fallback = None  # (-recall, bands, rows)
    for b, r in splits:
        recall = float(lsh_candidate_probability(threshold, b, r))
        fp_mass = float(
            np.trapz(lsh_candidate_probability(grid, b, r), grid)
        )
        if fallback is None or -recall < fallback[0]:
            fallback = (-recall, b, r)
        if recall >= min_recall and (
            best is None or (fp_mass, -recall) < (best[0], best[1])
        ):
            best = (fp_mass, -recall, b, r)
    if best is not None:
        return best[2], best[3]
    return fallback[1], fallback[2]


@functools.lru_cache(maxsize=8)
def _perms(num_perm: int, seed: int) -> tuple[np.ndarray, np.ndarray]:
    """Per-worker-process cached permutation parameters (1 KiB of state)."""
    return T.make_permutations(num_perm, seed)


def _doc_bytes(col: pa.Array | pa.ChunkedArray, cfg: MinHashConfig) -> list[bytes]:
    if cfg.normalize:
        return [s.encode() for s in T.normalize_texts(col)]
    return [s.encode() for s in col.to_pylist()]


def _eq_keys(
    batch: pa.Table,
    cfg: MinHashConfig,
    hashes: np.ndarray,
    offsets: np.ndarray,
) -> np.ndarray:
    """Per-doc 64-bit equivalence key for pair-complete mode.

    ``verify_mode="exact"``: hash of the raw text (equality classes =
    byte-identical content). Jaccard at threshold>=1.0: order-free hash
    of the unique shingle-hash set (classes = set equality). A key
    collision between classes is as (im)probable as the content-hash
    collisions the exact cascade already tolerates.
    """
    from doppel_ray.functions.hashing import sip64

    if cfg.verify_mode == "exact":
        return sip64(batch["text"].to_pandas()).astype(np.uint64)
    ends = np.concatenate([offsets[1:], [len(hashes)]])
    mult = np.uint64(0x9E3779B97F4A7C15)
    out = np.empty(len(offsets), dtype=np.uint64)
    with np.errstate(over="ignore"):
        for i, (s, e) in enumerate(zip(offsets, ends)):
            u = np.unique(hashes[s:e])
            mixed = (u * mult) ^ (u >> np.uint64(31))
            out[i] = np.bitwise_xor.reduce(mixed) * mult + np.uint64(len(u))
    return out


def sign_batch(
    batch: pa.Table, cfg: MinHashConfig, with_eq: bool = False
) -> pa.Table:
    """text -> flattened (url, band_key[, eq_key]) candidate rows (one per
    band). ``with_eq`` (pair-complete mode) adds the equivalence key the
    hot-band ring orders by."""
    byte_docs = _doc_bytes(batch["text"], cfg)
    hashes, offsets = T.shingle_hashes(byte_docs, cfg.shingle_n)
    if cfg.kernel == "oph":
        sigs = T.oph_signatures(hashes, offsets, cfg.num_perm, cfg.seed)
    else:
        a, b = _perms(cfg.num_perm, cfg.seed)
        sigs = T.minhash_from_shingles(hashes, offsets, a, b)
    keys = T.band_keys(sigs, cfg.bands, seed=cfg.seed)  # (n, bands) int64
    urls = batch["url"].to_pylist()
    cols = {
        "url": pa.array(np.repeat(urls, cfg.bands)),
        "band_key": pa.array(keys.ravel(), type=pa.int64()),
    }
    if with_eq:
        eq = _eq_keys(batch, cfg, hashes, offsets)
        cols["eq_key"] = pa.array(
            np.repeat(eq, cfg.bands).view(np.int64), type=pa.int64()
        )
    return pa.table(cols)


class MinHashSigner:
    """Actor-pool variant of ``sign_batch`` for deployments that extend the
    signer with heavy per-actor state; functionally identical."""

    def __init__(self, cfg: MinHashConfig):
        self.cfg = cfg
        self.a, self.b = T.make_permutations(cfg.num_perm, cfg.seed)

    def __call__(self, batch: pa.Table) -> pa.Table:
        return sign_batch(batch, self.cfg)


def _emit_pairs_bucket(g: pa.Table, cap: int) -> pa.Table:
    """All (or ring-capped) within-band pairs for every band group in the
    bucket, fully vectorized: one lexsort groups the rows, run-length
    encoding finds the groups, and pair emission gathers per group-SIZE
    class with ``np.triu_indices`` — no Python iteration over the (often
    hundreds of thousands of) band groups. Only hot bands (> cap, rare
    by construction) take a per-group loop, for the ring.

    When an ``eq_key`` column is present (pair-complete mode) the capped
    ring is ordered by (eq_key, url): members of one equivalence class
    are consecutive, so the ring contains a verified-edge path through
    every class even when a hot band mixes classes — the property clique
    expansion relies on."""
    if g.num_rows < 2:
        return PAIRS_SCHEMA.empty_table()
    has_eq = "eq_key" in g.column_names
    df = g.to_pandas()
    df = df.drop_duplicates(
        subset=["band_key", "url"]
    )  # a url can repeat an identical (url, band_key)
    sort_cols = ["band_key", "eq_key", "url"] if has_eq else ["band_key", "url"]
    df = df.sort_values(sort_cols, kind="stable", ignore_index=True)
    band = df["band_key"].to_numpy()
    urls = df["url"].to_numpy()
    n = len(band)
    change = np.empty(n, dtype=bool)
    change[0] = True
    np.not_equal(band[1:], band[:-1], out=change[1:])
    starts = np.flatnonzero(change)
    sizes = np.diff(np.append(starts, n))
    group_of_row = np.repeat(np.arange(len(starts)), sizes)
    row_size = sizes[group_of_row]
    ua_parts: list[np.ndarray] = []
    ub_parts: list[np.ndarray] = []
    dr_parts: list[np.ndarray] = []
    small_groups = (sizes >= 2) & (sizes <= cap)
    if small_groups.any():
        su = urls[small_groups[group_of_row]]
        ssz = row_size[small_groups[group_of_row]]
        for m in np.unique(ssz):
            mat = su[ssz == m].reshape(-1, int(m))
            ii, jj = np.triu_indices(int(m), 1)
            a = mat[:, ii].ravel()
            b = mat[:, jj].ravel()
            ua_parts.append(a)
            ub_parts.append(b)
            dr_parts.append(np.zeros(len(a), dtype=np.int64))
    for gi in np.flatnonzero(sizes > cap):
        # hot band: ring of consecutive pairs keeps the component
        # connected; report pruned pair count (no silent truncation) on
        # the ring's first pair
        s, m = int(starts[gi]), int(sizes[gi])
        mem = urls[s : s + m]
        d = np.zeros(m - 1, dtype=np.int64)
        d[0] = m * (m - 1) // 2 - (m - 1)
        ua_parts.append(mem[:-1])
        ub_parts.append(mem[1:])
        dr_parts.append(d)
    if not ua_parts:
        return PAIRS_SCHEMA.empty_table()
    a = np.concatenate(ua_parts)
    b = np.concatenate(ub_parts)
    d = np.concatenate(dr_parts)
    swap = a > b
    out = pd.DataFrame(
        {
            "url_a": np.where(swap, b, a),
            "url_b": np.where(swap, a, b),
            "dropped": d,
        }
    )
    # same pair from several bands in this bucket: dedupe HERE so the
    # downstream (driver or shuffle) dedupe sees ~pairs, not pairs x bands
    # (measured 3.3M -> ~0.15M rows on the 200k-doc bench)
    out = out.groupby(["url_a", "url_b"], sort=False, as_index=False)[
        "dropped"
    ].sum()
    return pa.Table.from_pandas(out, preserve_index=False).cast(PAIRS_SCHEMA)


def _emit_pairs_driver(t: pa.Table, cap: int) -> pa.Table:
    """Driver-regime pair emission: prefilter the collected signature
    rows to DUPLICATED band keys with one ``np.unique`` over the int64
    key column before any pandas/string work touches them. Singleton
    bands are the overwhelming majority of sig rows (measured 4.48M
    rows -> ~60k duplicated-band rows at 200k docs), and the pandas
    drop_duplicates + string-tiebreak sort in ``_emit_pairs_bucket``
    were 6.4s of driver time spent almost entirely on rows that can
    never emit a pair."""
    if t.num_rows < 2:
        return PAIRS_SCHEMA.empty_table()
    band = t["band_key"].to_numpy(zero_copy_only=False)
    u, inv, cnt = np.unique(band, return_inverse=True, return_counts=True)
    dup_mask = cnt[inv] > 1
    if not dup_mask.any():
        return PAIRS_SCHEMA.empty_table()
    return _emit_pairs_bucket(t.filter(pa.array(dup_mask)), cap)


def signatures(
    ds: Dataset, cfg: MinHashConfig, *, with_eq: bool = False
) -> Dataset:
    """Public signing step: pages -> narrow (url, band_key[, eq_key])
    signature rows. Exposed so callers can PERSIST signatures and skip
    re-signing a standing corpus on every run (incremental ingest:
    stages/incremental.py build_signature_index) — signing is the
    compute-dominant stage of near-dedup, and signature rows are a pure
    function of (text, cfg)."""
    return ds.map_batches(
        lambda t: sign_batch(t, cfg, with_eq=with_eq),
        batch_format="pyarrow",
        batch_size=cfg.batch_size,
    )


def candidate_pairs(
    ds: Dataset, cfg: MinHashConfig, *, sig: Dataset | None = None
) -> Dataset:
    """pages -> candidate pair rows (url_a < url_b, with dropped counts).

    Pairs surfacing in multiple bands are NOT deduped here (the collector
    in ``near_dup_edges`` does it in one vectorized pass); at true scale
    swap the collector for a bucketed groupby on (url_a, url_b).

    ``cfg.salt_hot_bands=True`` switches hot-band handling from the
    ring-cap to EXPLICIT SALTING (north-rule skew strategy): a cheap
    count pass finds bands larger than ``band_cap``; their rows get key
    ``(band_key, sip64(url) % n_salts)`` so one mega-band spreads over
    ``n_salts`` shuffle groups. Each salted subgroup emits its full
    clique (far more retained pairs than the ring); connectivity across
    subgroups is restored by a ring over the subgroup minima, so
    clustering results are unchanged. Costs one extra signing pass
    (avoided by materializing the signature rows) plus a narrow count
    shuffle.

    Pair-complete mode (equivalence contracts) always uses the
    eq-ordered ring path: salting's rep rings mix equivalence classes
    (their edges die in verification, breaking class connectivity), and
    clique expansion regenerates every pair afterward anyway — the ring
    is the skew-safe O(m) choice there.
    """
    with_eq = cfg.is_pair_complete
    if sig is None:
        sig = signatures(ds, cfg, with_eq=with_eq)
    elif with_eq and "eq_key" not in sig.schema().names:
        raise ValueError(
            "precomputed signatures lack eq_key but cfg is pair-complete; "
            "rebuild them with signatures(..., with_eq=True)"
        )
    cap = cfg.band_cap
    if with_eq or not cfg.salt_hot_bands:
        # Persist signature rows before anything touches them (the
        # signing map fused into Ray's sort operator runs at shuffle
        # task granularity — measured 32-40s fused vs 20.5s with the
        # sig rows cut out of the sort at 200k docs).
        sig = sig.materialize()
        if (
            cfg.scale_mode is not True
            and sig.count() <= cfg.sig_rows_collect_limit
        ):
            # driver regime: collect the narrow (url, band_key[, eq_key])
            # rows and emit pairs in one vectorized pass — skips BOTH
            # the band-count shuffle and the band sort (measured ~10s of
            # fixed sort-coordination at 200k docs/32 CPUs). Bound
            # documented on sig_rows_collect_limit.
            t = collect_table(sig)
            return ray.data.from_arrow(_emit_pairs_driver(t, cap))
        # scale path: PREFILTER to duplicated band keys before the
        # all-to-all — only bands with >=2 members can emit a pair, and
        # at web scale singleton bands are the overwhelming majority of
        # sig rows. The dup-key set comes from the combiner-first count
        # in ``exact.duplicated_key_values`` (per-block np.unique
        # partials, narrow groupby-sum merge) and is broadcast for a
        # semi-join — the standard semi-join push-down, identical
        # output.
        from doppel_ray.stages.exact import duplicated_key_values

        dup_keys = duplicated_key_values(sig, "band_key")
        if len(dup_keys) == 0:
            return ray.data.from_arrow(PAIRS_SCHEMA.empty_table())
        band_rows = semi_filter(sig, "band_key", dup_keys)
        return bucketed_group_apply(
            band_rows,
            "band_key",
            lambda g: _emit_pairs_bucket(g, cap),
            num_buckets=cfg.num_buckets,
        )

    from ray.data.aggregate import Count

    sig = sig.materialize()  # reused by the count pass and the emission pass
    hot_t = collect_table(
        sig.groupby("band_key")
        .aggregate(Count(alias_name="n"))
        .filter(expr=f"n > {cap}")
    )
    hot = set(hot_t["band_key"].to_pylist()) if hot_t.num_rows else set()
    hot_ref = ray.put(hot)
    n_salts = cfg.n_salts

    def add_salt(batch: pa.Table) -> pa.Table:
        from doppel_ray.functions.hashing import sip64

        hot_keys = ray.get(hot_ref)
        keys = batch["band_key"].to_numpy(zero_copy_only=False)
        salts = np.zeros(len(keys), dtype=np.int64)
        if hot_keys:
            is_hot = np.fromiter(
                (k in hot_keys for k in keys), count=len(keys), dtype=bool
            )
            if is_hot.any():
                s = (
                    sip64(pd.Series(batch["url"].to_pylist())) % np.uint64(n_salts)
                ).astype(np.int64)
                salts[is_hot] = s[is_hot]
        # fold salt into the shuffle key; keep the raw band_key so the
        # emitter can ring the subgroup minima back together
        salted = keys * np.int64(n_salts) + salts
        return pa.table(
            {
                "salted_key": pa.array(salted, type=pa.int64()),
                "band_key": batch["band_key"],
                "url": batch["url"],
            }
        )

    salted_rows = sig.map_batches(add_salt, batch_format="pyarrow")

    def emit(g: pa.Table) -> pa.Table:
        # cliques within each salted subgroup (full pairs — salting
        # already bounded subgroup size to ~group/n_salts); pair rows
        # only, deduped per bucket. Cross-subgroup connectivity is
        # restored separately (below) from a tiny rep aggregation — no
        # sentinel rows mixed into the pair stream.
        df = g.to_pandas().drop_duplicates(subset=["salted_key", "url"])
        ua, ub = [], []
        for _, grp in df.groupby("salted_key", sort=False):
            urls = sorted(grp["url"].tolist())
            m = len(urls)
            for i in range(m):
                for j in range(i + 1, m):
                    ua.append(urls[i])
                    ub.append(urls[j])
        out = pd.DataFrame({"url_a": ua, "url_b": ub}).drop_duplicates()
        out["dropped"] = 0
        return pa.Table.from_pandas(out, preserve_index=False).cast(PAIRS_SCHEMA)

    pairs_ds = bucketed_group_apply(
        salted_rows, "salted_key", emit, num_buckets=cfg.num_buckets
    )

    # connectivity repair: min url per (band, salt) subgroup of the HOT
    # bands — #hot x n_salts rows by construction — ringed per band so a
    # salted mega-band still forms one component for clustering
    def only_hot(batch: pa.Table) -> pa.Table:
        hk = ray.get(hot_ref)
        keys = batch["band_key"].to_numpy(zero_copy_only=False)
        m = np.fromiter((k in hk for k in keys), count=len(keys), dtype=bool)
        return batch.filter(pa.array(m))

    from ray.data.aggregate import Min

    reps_t = collect_table(
        salted_rows.map_batches(only_hot, batch_format="pyarrow")
        .groupby(["band_key", "salted_key"])
        .aggregate(Min("url", alias_name="rep"))
    )
    if reps_t.num_rows:
        rdf = reps_t.to_pandas()
        ua, ub = [], []
        for _, grp in rdf.groupby("band_key", sort=False):
            r = sorted(set(grp["rep"].tolist()))
            for i in range(len(r) - 1):
                ua.append(r[i])
                ub.append(r[i + 1])
        if ua:
            ring = pa.table(
                {
                    "url_a": pa.array(ua, type=pa.string()),
                    "url_b": pa.array(ub, type=pa.string()),
                    "dropped": pa.array([0] * len(ua), type=pa.int64()),
                },
                schema=PAIRS_SCHEMA,
            )
            pairs_ds = pairs_ds.union(ray.data.from_arrow(ring))
    return pairs_ds


def shingle_sets_for(
    ds: Dataset, urls: pa.Array, cfg: MinHashConfig
) -> dict[str, np.ndarray]:
    """Distributed exact shingle-set computation for the candidate urls;
    collected to the driver for broadcast (bounded by candidate count)."""

    def to_sets(batch: pa.Table) -> pa.Table:
        byte_docs = _doc_bytes(batch["text"], cfg)
        sets = T.unique_shingles(byte_docs, cfg.shingle_n)
        return pa.table(
            {
                "url": batch["url"],
                "shingles": pa.array(
                    [s.view(np.int64) for s in sets], type=pa.list_(pa.int64())
                ),
            }
        )

    cand = semi_filter(ds.select_columns(["url", "text"]), "url", urls)
    out = {}
    for b in cand.map_batches(to_sets, batch_format="pyarrow").iter_batches(
        batch_format="pyarrow"
    ):
        # zero-copy ragged gather: slice the list column's values buffer
        # by offsets instead of materializing 10^7s of Python ints
        col = b["shingles"].combine_chunks()
        offs = col.offsets.to_numpy()
        vals = col.values.to_numpy(zero_copy_only=False).view(np.uint64)
        for i, u in enumerate(b["url"].to_pylist()):
            out[u] = vals[offs[i] : offs[i + 1]]
    return out


def content_hashes_for(ds: Dataset, urls: pa.Array) -> dict[str, str]:
    """{url: full-content hash} for the candidate urls (exact verify mode)."""
    from doppel_ray.functions import hashing

    def to_hashes(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "url": batch["url"],
                "h": pa.array(hashing.content_hash(batch["text"])),
            }
        )

    cand = semi_filter(ds.select_columns(["url", "text"]), "url", urls)
    out = {}
    for b in cand.map_batches(to_hashes, batch_format="pyarrow").iter_batches(
        batch_format="pyarrow"
    ):
        for u, h in zip(b["url"].to_pylist(), b["h"].to_pylist()):
            out[u] = h
    return out


def _verify_batch(
    batch: pa.Table, lookup: dict, threshold: float, mode: str
) -> pa.Table:
    ua = batch["url_a"].to_pylist()
    ub = batch["url_b"].to_pylist()
    sims = np.empty(len(ua), dtype=np.float64)
    for i, (x, y) in enumerate(zip(ua, ub)):
        sa = lookup.get(x)
        sb = lookup.get(y)
        if sa is None or sb is None:
            sims[i] = 0.0
        elif mode == "exact":
            sims[i] = 1.0 if sa == sb else 0.0
        else:
            sims[i] = T.exact_jaccard(sa, sb)
    tbl = pa.table(
        {
            "url_a": batch["url_a"],
            "url_b": batch["url_b"],
            "similarity": pa.array(sims),
        }
    )
    return tbl.filter(pa.array(sims >= threshold))


class PairVerifier:
    """Actor-pool verifier holding the broadcast lookup ({url: shingle set}
    in jaccard mode, {url: content hash} in exact mode)."""

    def __init__(self, lookup_ref, threshold: float, mode: str = "jaccard"):
        self.lookup: dict = ray.get(lookup_ref)
        self.threshold = threshold
        self.mode = mode

    def __call__(self, batch: pa.Table) -> pa.Table:
        return _verify_batch(batch, self.lookup, self.threshold, self.mode)


from doppel_ray.stages.util import collect_table  # noqa: E402 (re-export)


def dedupe_pairs(pairs: Dataset, num_buckets: int) -> Dataset:
    """Distributed pair dedupe: the same pair surfaces from up to ``bands``
    different band groups; bucket by url_a (all copies co-locate) and
    drop duplicates per bucket, keeping the dropped-pair tally."""

    def per_bucket(g: pa.Table) -> pa.Table:
        df = g.to_pandas()
        agg = df.groupby(["url_a", "url_b"], sort=False, as_index=False)[
            "dropped"
        ].sum()
        return pa.Table.from_pandas(agg, preserve_index=False).cast(PAIRS_SCHEMA)

    return bucketed_group_apply(pairs, "url_a", per_bucket, num_buckets=num_buckets)


def _routed_verify(
    ds: Dataset, pairs_t: pa.Table, cfg: MinHashConfig
) -> Dataset:
    """Distributed verification via ONE bucketed shuffle with text routing.

    The (already driver-materialized, small) pair list determines which
    bucket verifies each pair: bucket(pair) = sip64(url_a) % B. A routing
    map {url -> buckets needing its text} is broadcast (O(candidate docs),
    ~60 B/doc), the corpus stream replicates each candidate text to its
    buckets (replication factor = distinct pair-buckets per doc, ~1), and
    each bucket independently recomputes shingle sets with the vectorized
    kernel and verifies its pairs. No list-column carries, no pandas
    merges, no per-row Python in the shuffle path.

    Documented scale assumption: the routing map (like the candidate url
    set) fits the driver — holds to ~10^8 candidate docs; beyond that,
    shard the pair list and run this stage per shard.
    """
    from doppel_ray.functions.hashing import sip64

    B = cfg.num_buckets
    pdf = pairs_t.to_pandas()
    pdf["bucket"] = (sip64(pdf["url_a"]) % np.uint64(B)).astype(np.int64)
    route_df = (
        pd.concat(
            [
                pdf[["url_a", "bucket"]].rename(columns={"url_a": "url"}),
                pdf[["url_b", "bucket"]].rename(columns={"url_b": "url"}),
            ]
        )
        .drop_duplicates()
    )
    routing: dict[str, np.ndarray] = {
        u: g.to_numpy() for u, g in route_df.groupby("url")["bucket"]
    }
    ref = ray.put(routing)

    def route_texts(batch: pa.Table) -> pa.Table:
        rmap = ray.get(ref)
        urls = batch["url"].to_pylist()
        idx: list[int] = []
        buckets: list[int] = []
        for i, u in enumerate(urls):
            bs = rmap.get(u)
            if bs is not None:
                idx.extend([i] * len(bs))
                buckets.extend(bs.tolist())
        if not idx:
            return pa.table(
                {
                    "bucket": pa.array([], type=pa.int64()),
                    "url_a": pa.array([], type=pa.string()),
                    "url_b": pa.array([], type=pa.string()),
                    "text": pa.array([], type=pa.large_string()),
                }
            )
        taken = batch.take(pa.array(idx, type=pa.int64()))
        return pa.table(
            {
                "bucket": pa.array(buckets, type=pa.int64()),
                "url_a": taken["url"],
                "url_b": pa.nulls(len(idx), type=pa.string()),
                "text": pc.cast(taken["text"], pa.large_string()),
            }
        )

    routed = ds.select_columns(["url", "text"]).map_batches(
        route_texts, batch_format="pyarrow"
    )
    pairs_tagged = ray.data.from_arrow(
        pa.table(
            {
                "bucket": pa.array(pdf["bucket"], type=pa.int64()),
                "url_a": pa.array(pdf["url_a"], type=pa.string()),
                "url_b": pa.array(pdf["url_b"], type=pa.string()),
                "text": pa.nulls(len(pdf), type=pa.large_string()),
            }
        )
    )
    unioned = pairs_tagged.union(routed)
    threshold, mode = cfg.threshold, cfg.verify_mode
    verify_schema = pa.schema(
        [
            ("url_a", pa.string()),
            ("url_b", pa.string()),
            ("similarity", pa.float64()),
        ]
    )

    def per_bucket(g: pa.Table) -> pa.Table:
        is_text = pc.is_valid(g["text"])
        texts_t = g.filter(is_text)
        pair_t = g.filter(pc.invert(is_text))
        if pair_t.num_rows == 0:
            return verify_schema.empty_table()
        if mode == "exact":
            from doppel_ray.functions import hashing

            payloads = hashing.content_hash(texts_t["text"])
            lookup = dict(zip(texts_t["url_a"].to_pylist(), payloads))
        else:
            byte_docs = _doc_bytes(texts_t["text"], cfg)
            sets = T.unique_shingles(byte_docs, cfg.shingle_n)
            lookup = dict(zip(texts_t["url_a"].to_pylist(), sets))
        batch = pa.table(
            {"url_a": pair_t["url_a"], "url_b": pair_t["url_b"]}
        )
        return _verify_batch(batch, lookup, threshold, mode)

    return (
        unioned.groupby("bucket")
        .map_groups(lambda g: per_bucket(g.drop_columns(["bucket"])), batch_format="pyarrow")
    )


def _distributed_verify(ds: Dataset, pairs: Dataset, cfg: MinHashConfig) -> Dataset:
    """Fully-distributed verification: the shared two-pass bucketed text
    join (stages/textjoin.py, factored out of this module in r3) co-locates
    each pair with both texts; a final stateless ``map_batches`` recomputes
    both shingle sets with the vectorized kernel and keeps pairs >= tau.
    No driver-side data structure of any size — the configuration for true
    multi-node scale, where even the deduped pair list exceeds driver
    memory. Pair repeats from overlapping bands are deduped inside the
    join's first pass (all copies share url_a)."""
    from doppel_ray.stages.textjoin import pair_text_join

    joined = pair_text_join(
        ds.select_columns(["url", "text"]), pairs, num_buckets=cfg.num_buckets
    )

    threshold, mode = cfg.threshold, cfg.verify_mode
    shingle_n = cfg.shingle_n

    def verify(batch: pa.Table) -> pa.Table:
        out_schema = pa.schema(
            [
                ("url_a", pa.string()),
                ("url_b", pa.string()),
                ("similarity", pa.float64()),
            ]
        )
        if batch.num_rows == 0:
            return out_schema.empty_table()
        if mode == "exact":
            from doppel_ray.functions import hashing

            ha = hashing.content_hash(batch["text_a"])
            hb = hashing.content_hash(batch["text_b"])
            sims = np.array(
                [1.0 if x == y else 0.0 for x, y in zip(ha, hb)]
            )
        else:
            docs_a = _doc_bytes(batch["text_a"], cfg)
            docs_b = _doc_bytes(batch["text_b"], cfg)
            sets_a = T.unique_shingles(docs_a, shingle_n)
            sets_b = T.unique_shingles(docs_b, shingle_n)
            sims = np.array(
                [
                    1.0
                    if len(sa) == 0 and len(sb) == 0
                    else T.exact_jaccard(sa, sb)
                    for sa, sb in zip(sets_a, sets_b)
                ]
            )
        keep = pa.array(sims >= threshold)
        return pa.table(
            {
                "url_a": batch["url_a"].filter(keep),
                "url_b": batch["url_b"].filter(keep),
                "similarity": pa.array(sims).filter(keep),
            },
            schema=out_schema,
        )

    return joined.map_batches(verify, batch_format="pyarrow")


def _dup_fraction_estimate(keyed: Dataset, k: int = 4096) -> float:
    """Estimated duplicate fraction 1 - distinct(eq_key)/N via a KMV
    (k-minimum-values) sketch: each block contributes its k smallest
    unique eq_keys plus its row count — one narrow scan, no shuffle,
    driver state O(blocks * k). eq_keys are sip64 hashes, i.e. uniform
    in [0, 2^64), which is exactly the KMV assumption; relative error
    ~1/sqrt(k) ≈ 1.6% at the default k."""

    def partial(batch: pa.Table):
        v = batch["eq_key"].to_numpy(zero_copy_only=False).view(np.uint64)
        u = np.unique(v)  # sorted ascending (unsigned order)
        return pa.table(
            {
                "kmin": pa.array([u[:k].view(np.int64)], type=pa.list_(pa.int64())),
                "n": pa.array([len(v)], type=pa.int64()),
            }
        )

    t = collect_table(
        keyed.map_batches(partial, batch_format="pyarrow", batch_size=None)
    )
    total = int(pc.sum(t["n"]).as_py() or 0)
    if total == 0:
        return 0.0
    col = t["kmin"].combine_chunks()
    merged = np.unique(col.values.to_numpy(zero_copy_only=False).view(np.uint64))
    if len(merged) < k:
        distinct = float(len(merged))  # no block truncated: exact
    else:
        kth = float(merged[k - 1])
        distinct = (k - 1) * (2.0**64) / kth
    return max(0.0, 1.0 - min(distinct, total) / total)


def _prune_exact_classes(
    ds: Dataset, cfg: MinHashConfig
) -> tuple[Dataset, Dataset | None]:
    """Collapse identical-text classes to representatives (min url).

    Classes are RAW-text equality classes (one sip64 per doc — no
    normalization pass): raw-identical texts are identical under every
    downstream measure (normalized shingle sets, signatures, content
    hashes), so pruning them is sound in both jaccard and exact verify
    modes; case/whitespace variants simply flow through the ordinary
    LSH path instead of being pruned.

    The class-resolve shuffle + anti-join only pay for themselves when
    the corpus actually carries duplicates, so a KMV sketch over the
    (materialized, narrow) key stream gates them: below
    ``cfg.prune_min_dup_fraction`` the prune is skipped entirely
    (VERDICT r2 #1). When it engages, one NARROW (url, eq_key) shuffle
    resolves the classes — the corpus text never moves — and the
    non-representative url set (bounded by duplicated docs, the exact
    cascade's documented broadcast bound) is broadcast for an anti
    semi-join that drops the redundant copies from the stream. Returns
    (pruned ds, members) — members is None when the prune is skipped or
    finds nothing.
    """
    from doppel_ray.functions.hashing import sip64
    from doppel_ray.stages.prune import split_rep_groups

    def eq_rows(batch: pa.Table) -> pa.Table:
        eq = sip64(batch["text"].to_pandas()).view(np.int64)
        return pa.table(
            {
                "url": batch["url"],
                "eq_key": pa.array(eq, type=pa.int64()),
            }
        )

    # materialized: (a) reused by the sketch AND the class shuffle, and
    # (b) keeps the hashing map out of the sort operator (a map fused
    # into Ray's shuffle runs at shuffle-task granularity — the
    # measured 3-6x trap, see bucketed_group_apply)
    keyed = ds.map_batches(
        eq_rows, batch_format="pyarrow", batch_size=cfg.batch_size
    ).materialize()

    from doppel_ray.stages.exact import DRIVER_AGG_LIMIT

    def partial(batch: pa.Table) -> pa.Table:
        u, c = np.unique(
            batch["eq_key"].to_numpy(zero_copy_only=False), return_counts=True
        )
        return pa.table(
            {"eq_key": pa.array(u), "cnt": pa.array(c.astype(np.int64))}
        )

    partials = keyed.map_batches(
        partial, batch_format="pyarrow", batch_size=None
    ).materialize()
    if partials.count() <= DRIVER_AGG_LIMIT:
        # fast path: merge the per-block partial counts on the driver —
        # gives the EXACT dup fraction for the gate plus the dup-key
        # set, and resolves reps without the class sort. Members are
        # bounded by duplicated docs (the documented broadcast bound —
        # the sort path collects the same table below).
        pt = collect_table(partials)
        cnt = pt["cnt"].to_numpy(zero_copy_only=False)
        u, idx = np.unique(
            pt["eq_key"].to_numpy(zero_copy_only=False), return_inverse=True
        )
        tot = np.zeros(len(u), dtype=np.int64)
        np.add.at(tot, idx, cnt)
        total = int(cnt.sum())
        if total == 0 or 1.0 - len(u) / total < cfg.prune_min_dup_fraction:
            return ds, None
        dup_keys = pa.array(u[tot > 1])
        mem_t = collect_table(semi_filter(keyed, "eq_key", dup_keys))
        if mem_t.num_rows == 0:
            return ds, None
        # rep = min(url) per eq class, resolved with one Arrow multi-key
        # sort (C++) instead of a pandas string groupby-transform
        # (measured 7.3 s vs ~0.3 s at 429k member rows): after sorting
        # by (eq_key, url) the first row of each class is its rep.
        srt = mem_t.sort_by([("eq_key", "ascending"), ("url", "ascending")])
        eq_s = srt["eq_key"].to_numpy(zero_copy_only=False)
        urls_s = srt["url"].combine_chunks()
        starts = np.flatnonzero(np.r_[True, eq_s[1:] != eq_s[:-1]])
        gid = np.cumsum(np.r_[0, (eq_s[1:] != eq_s[:-1]).astype(np.int64)])
        rep_s = urls_s.take(pa.array(starts[gid]))
        members_t = pa.table(
            {"rep": rep_s, "url": urls_s}, schema=MEMBERS_FILTER_SCHEMA
        )
        non_rep = urls_s.filter(pc.invert(pc.equal(rep_s, urls_s)))
        if len(non_rep) == 0:
            return ds, None
        pruned = semi_filter(ds, "url", non_rep, invert=True)
        return pruned, ray.data.from_arrow(members_t)

    # scale fallback: KMV-estimated gate (no driver count merge), then
    # the distributed class-resolve sort
    if _dup_fraction_estimate(keyed) < cfg.prune_min_dup_fraction:
        return ds, None
    _, members = split_rep_groups(keyed, cfg.num_buckets)
    mem_t = collect_table(members, MEMBERS_FILTER_SCHEMA)
    non_rep = mem_t.filter(
        pc.invert(pc.equal(mem_t["rep"], mem_t["url"]))
    )["url"].combine_chunks()
    if len(non_rep) == 0:
        return ds, None
    pruned = semi_filter(ds, "url", non_rep, invert=True)
    return pruned, members


MEMBERS_FILTER_SCHEMA = pa.schema([("rep", pa.string()), ("url", pa.string())])


_EXPAND_SCHEMA = pa.schema(
    [
        ("url_a", pa.string()),
        ("url_b", pa.string()),
        ("similarity", pa.float64()),
    ]
)


def _clique_chunks(member_lists, out_schema: pa.Schema):
    """Yield clique pair tables over sorted member lists in bounded
    chunks so the quadratic output never materializes in one piece."""
    chunk = 1 << 16
    ua: list[np.ndarray] = []
    ub: list[np.ndarray] = []
    size = 0
    for lst in member_lists:
        arr = np.asarray(lst)  # sorted -> arr[i] < arr[j] for i < j
        m = len(arr)
        for i in range(m - 1):
            ua.append(np.full(m - i - 1, arr[i]))
            ub.append(arr[i + 1 :])
            size += m - i - 1
            if size >= chunk:
                a = np.concatenate(ua)
                b = np.concatenate(ub)
                ua, ub, size = [], [], 0
                yield pa.table(
                    {
                        "url_a": pa.array(a, type=pa.string()),
                        "url_b": pa.array(b, type=pa.string()),
                        "similarity": pa.array(np.ones(len(a))),
                    },
                    schema=out_schema,
                )
    if size:
        a = np.concatenate(ua)
        b = np.concatenate(ub)
        yield pa.table(
            {
                "url_a": pa.array(a, type=pa.string()),
                "url_b": pa.array(b, type=pa.string()),
                "similarity": pa.array(np.ones(len(a))),
            },
            schema=out_schema,
        )


def _expand_cliques(
    edges: Dataset, members: Dataset | None, cfg: MinHashConfig
) -> Dataset:
    """Pair-complete expansion for equivalence contracts.

    Verified similarity-1.0 edges (content equality / shingle-set
    equality) form an equivalence relation, so the complete pair set is
    the full clique over each connected component — ring-capped hot
    bands emit only O(m) of the O(m^2) pairs per class (ADVICE r1: 80
    identical docs must yield 3160 pairs, not a 79-edge ring).

    ``edges`` are REP-LEVEL verified edges (pre-reattachment, ring-
    bounded); pruned exact-dup classes fold in as rep->member STAR
    edges (O(class size), never the quadratic intra-class clique — the
    quadratic relation exists only in the emitted output stream, fixing
    ADVICE r2 medium). Components are computed with a driver union-find
    while the star+rep edge count stays under
    ``cfg.clique_driver_edge_limit``; above it the distributed
    min-label propagation (stages/cluster.py) labels every url and
    cliques are emitted per-component inside a bucketed groupby — no
    driver data path at all (VERDICT r2 #8).
    """
    out_schema = _EXPAND_SCHEMA
    star: Dataset | None = None
    if members is not None:
        # rep->member star edges; (rep, rep) self-rows are harmless to a
        # union-find but dropped to keep edge counts meaningful
        def to_star(batch: pa.Table) -> pa.Table:
            keep = pc.invert(pc.equal(batch["rep"], batch["url"]))
            t = batch.filter(keep)
            return pa.table(
                {
                    "url_a": t["rep"],
                    "url_b": t["url"],
                    "similarity": pa.array(
                        np.ones(t.num_rows), type=pa.float64()
                    ),
                },
                schema=out_schema,
            )

        star = members.map_batches(to_star, batch_format="pyarrow")

    rep_edges = edges.select_columns(["url_a", "url_b", "similarity"])
    all_edges = rep_edges.union(star) if star is not None else rep_edges
    all_edges = all_edges.materialize()
    n_edges = all_edges.count()
    if n_edges == 0:
        return ray.data.from_arrow(out_schema.empty_table())

    if n_edges > cfg.clique_driver_edge_limit:
        # fully distributed: label every url, then emit each component's
        # clique inside its own bucket group (quadratic rows stream out
        # of the groupby tasks, bounded per component)
        from doppel_ray.stages.cluster import cluster_edges_distributed

        labels = cluster_edges_distributed(
            all_edges, num_buckets=cfg.num_buckets
        )

        def emit_bucket(g: pa.Table) -> pa.Table:
            # per-task memory bound: this bucket's clique rows (largest
            # component's O(m^2) pairs) — the same inherent bound as the
            # pair-complete output itself, now spread over buckets
            # instead of concentrated on the driver
            df = g.to_pandas()
            lists = (
                df.groupby("cluster_id", sort=False)["url"]
                .apply(lambda s: sorted(s.tolist()))
                .tolist()
            )
            chunks = list(
                _clique_chunks((l for l in lists if len(l) >= 2), out_schema)
            )
            if not chunks:
                return out_schema.empty_table()
            return pa.concat_tables(chunks)

        return bucketed_group_apply(
            labels, "cluster_id", emit_bucket, num_buckets=cfg.num_buckets
        )

    t = collect_table(all_edges.select_columns(["url_a", "url_b"]))
    from doppel_ray.state.unionfind import UnionFind

    uf = UnionFind()
    uf.add_edges(zip(t["url_a"].to_pylist(), t["url_b"].to_pylist()))
    comps: dict[str, list[str]] = {}
    for u, root in uf.labels().items():
        comps.setdefault(root, []).append(u)
    comp_lists = [sorted(v) for v in comps.values() if len(v) >= 2]
    if not comp_lists:
        return ray.data.from_arrow(out_schema.empty_table())
    comp_t = pa.table(
        {"members": pa.array(comp_lists, type=pa.list_(pa.string()))}
    )

    def emit(batch: pa.Table):
        yield from _clique_chunks(batch["members"].to_pylist(), out_schema)

    return ray.data.from_arrow(comp_t).map_batches(
        emit, batch_format="pyarrow", batch_size=64
    )


def _unique_pair_urls(pairs: Dataset) -> pa.Array:
    """Distinct urls appearing in any candidate pair (vectorized collect)."""
    t = collect_table(pairs.select_columns(["url_a", "url_b"]))
    if t.num_rows == 0:
        return pa.array([], type=pa.string())
    both = pa.concat_arrays(
        [t["url_a"].combine_chunks(), t["url_b"].combine_chunks()]
    )
    import pyarrow.compute as pc

    return pc.unique(both)


def near_dup_edges(
    ds: Dataset,
    cfg: MinHashConfig | None = None,
    *,
    sig: Dataset | None = None,
) -> Dataset:
    """pages -> verified near-dup edges (url_a, url_b, similarity, kind).

    ``similarity`` is the exact Jaccard over unique char-n-gram shingle
    hashes of the normalized text; only pairs >= cfg.threshold survive.
    Verification auto-selects broadcast (small candidate sets) vs the
    fully-distributed bucketed join (see module docstring);
    ``cfg.scale_mode=None`` (default) additionally auto-engages the
    zero-driver-data-path configuration when the measured candidate
    pair count exceeds ``driver_verify_limit`` — callers never have to
    know they crossed the scale boundary.
    """
    cfg = cfg or MinHashConfig()
    members = None
    if sig is not None and cfg.prune_exact:
        # precomputed signatures cover the UNPRUNED doc set; pruning
        # would sign a different set. Callers pass prune_exact=False
        # (results identical — prune==unpruned equivalence is pinned).
        raise ValueError(
            "precomputed signatures require cfg.prune_exact=False"
        )
    if cfg.prune_exact:
        ds, members = _prune_exact_classes(ds, cfg)
    pairs = candidate_pairs(ds, cfg, sig=sig)
    scale = cfg.scale_mode
    if scale is not True:
        # the pair count picks the regime (and the driver-collect bound
        # must be known before collecting), so materialize + count: the
        # pair stream is narrow, lives in the object store, and the
        # barrier keeps the emission sort from fusing with downstream
        # shuffles. Explicit scale_mode=True skips all of it — the
        # two-pass join's first bucket (on url_a) co-locates and
        # dedupes every copy of a pair anyway, so a dedicated dedupe
        # all-to-all would be pure overhead (measured +20s on the 400k
        # scaling bench).
        pairs = pairs.materialize()
        n_raw = pairs.count()
        if scale is None:
            scale = n_raw > cfg.driver_verify_limit
        if not scale and n_raw > cfg.dedupe_collect_limit:
            # big-but-driver-feasible pair stream: distributed bucketed
            # dedupe first (a pair surfaces from up to ``bands`` band
            # groups — measured 2.65M raw rows -> 118k distinct pairs
            # at 200k docs) so the driver only ever sees DISTINCT pairs
            pairs = dedupe_pairs(pairs, cfg.num_buckets).materialize()
    if scale:
        # segment at stage boundaries: the fully fused DAG (sign -> band
        # sort -> two join sorts -> expansion) interleaves its all-to-all
        # operators under the streaming executor with pathological
        # results (measured 257s fused vs 72s segmented at 800k docs,
        # 32 CPUs); pair and edge streams are tiny next to the corpus.
        # (No-op when the auto path above already materialized.)
        pairs = pairs.materialize()
        edges = _distributed_verify(
            ds, pairs.drop_columns(["dropped"]), cfg
        ).materialize()
        if cfg.is_pair_complete:
            edges = _expand_cliques(edges, members, cfg)
        else:
            edges = _reattach_classes(edges, members, cfg)

        def tag_scale(batch: pa.Table) -> pa.Table:
            return batch.append_column(
                "kind", pa.array(["minhash"] * batch.num_rows, type=pa.string())
            )

        return edges.map_batches(tag_scale, batch_format="pyarrow")
    # driver regime: collect the (small) pair stream and dedupe it in
    # one vectorized pass — below ``dedupe_collect_limit`` this replaces
    # the dedicated dedupe shuffle (VERDICT r2 #1: shuffle overhead that
    # bought nothing at bench scale). Documented scale bound: the
    # collected list fits the driver — the auto selector above switches
    # to the fully-distributed join before that bound is approached.
    pairs_t = collect_table(pairs, PAIRS_SCHEMA)
    if pairs_t.num_rows == 0:
        # no candidate pairs among representatives — pruned classes may
        # still carry intra-class edges, so fall through to reattachment
        empty = _EXPAND_SCHEMA.empty_table()
        if cfg.is_pair_complete:
            edges = _expand_cliques(ray.data.from_arrow(empty), members, cfg)
        else:
            edges = _reattach_classes(ray.data.from_arrow(empty), members, cfg)

        def tag_empty(batch: pa.Table) -> pa.Table:
            return batch.append_column(
                "kind", pa.array(["minhash"] * batch.num_rows, type=pa.string())
            )

        return edges.map_batches(tag_empty, batch_format="pyarrow")
    pdf = (
        pairs_t.to_pandas()
        .groupby(["url_a", "url_b"], sort=False, as_index=False)["dropped"]
        .sum()
    )
    both = pa.array(pd.concat([pdf["url_a"], pdf["url_b"]]), type=pa.string())
    cand_urls = pc.unique(both)

    if len(cand_urls) <= cfg.driver_verify_limit:
        # shingle sets computed DISTRIBUTED (semi-filtered corpus scan,
        # vectorized kernel), streamed to the driver; the pair loop
        # itself is a few C-speed intersect1d calls per thousand pairs.
        # Below broadcast_limit the loop is shipped back out via ray.put
        # (cheap); above it the lookup stays driver-local — shipping a
        # multi-GB pickle to every worker process costs more than the
        # loop (measured: 118k pairs verify in ~2s on the driver vs ~21s
        # for the bucketed-shuffle join it replaces at 200k docs).
        if cfg.verify_mode == "exact":
            lookup = content_hashes_for(ds, cand_urls)
        else:
            lookup = shingle_sets_for(ds, cand_urls, cfg)
        pairs_tbl = pa.table(
            {
                "url_a": pa.array(pdf["url_a"], type=pa.string()),
                "url_b": pa.array(pdf["url_b"], type=pa.string()),
            }
        )
        if len(cand_urls) <= cfg.broadcast_limit:
            ref = ray.put(lookup)
            threshold, mode = cfg.threshold, cfg.verify_mode

            def verify(batch: pa.Table) -> pa.Table:
                return _verify_batch(batch, ray.get(ref), threshold, mode)

            from doppel_ray.stages.util import from_arrow_blocks

            # slice the pair table into blocks or the verify runs as ONE
            # task (from_arrow = one block) — measured 3.6 s single-task
            # vs fan-out across the pool at 190k pairs / 5k docs
            edges = from_arrow_blocks(pairs_tbl, 4 * cfg.num_buckets).map_batches(
                verify, batch_format="pyarrow"
            )
        else:
            verified = _verify_batch(
                pairs_tbl, lookup, cfg.threshold, cfg.verify_mode
            )
            edges = ray.data.from_arrow(verified)
    else:
        # true-scale path: one bucketed shuffle with text routing; the
        # documented bound is the routing map fitting the driver
        edges = _routed_verify(
            ds,
            pa.table(
                {
                    "url_a": pa.array(pdf["url_a"], type=pa.string()),
                    "url_b": pa.array(pdf["url_b"], type=pa.string()),
                }
            ),
            cfg,
        )

    if cfg.is_pair_complete:
        edges = _expand_cliques(edges, members, cfg)
    else:
        edges = _reattach_classes(edges, members, cfg)

    def tag(batch: pa.Table) -> pa.Table:
        return batch.append_column(
            "kind", pa.array(["minhash"] * batch.num_rows, type=pa.string())
        )

    return edges.map_batches(tag, batch_format="pyarrow")


def _reattach_classes(
    edges: Dataset, members: Dataset | None, cfg: MinHashConfig
) -> Dataset:
    """Restore the full pair relation after exact-class pruning:
    intra-class cliques at similarity 1.0 plus rep-edge cross products
    (identical texts ⇒ identical shingle sets ⇒ the rep's verified
    similarity is every member's). No-op when nothing was pruned.

    The membership map is broadcast (``ray.put`` once, read per task)
    and expansion is a pure generator map over the edge stream — no
    shuffles. This adds NO new scale bound: the prune stage already
    broadcasts the same duplicated-member set for its anti semi-join,
    and both are bounded by duplicated docs (exact.py:20-23 bound)."""
    if members is None:
        return edges
    mem_t = collect_table(members, MEMBERS_FILTER_SCHEMA)
    groups: dict[str, list[str]] = {}
    for r, u in zip(mem_t["rep"].to_pylist(), mem_t["url"].to_pylist()):
        groups.setdefault(r, []).append(u)
    ref = ray.put(groups)
    out_schema = pa.schema(
        [
            ("url_a", pa.string()),
            ("url_b", pa.string()),
            ("similarity", pa.float64()),
        ]
    )

    def expand(batch: pa.Table) -> pa.Table:
        from doppel_ray.stages.util import cached_get

        # cached_get: the membership map deserializes once per WORKER,
        # not once per batch (a ~50 MB dict re-unpickled per batch was
        # a flat multi-second cost in the 800k scaling profile)
        g = cached_get(ref)
        ua: list[str] = []
        ub: list[str] = []
        sims: list[float] = []
        for a, b, s in zip(
            batch["url_a"].to_pylist(),
            batch["url_b"].to_pylist(),
            batch["similarity"].to_pylist(),
        ):
            for x in g.get(a, (a,)):
                for y in g.get(b, (b,)):
                    if x < y:
                        ua.append(x); ub.append(y)
                    else:
                        ua.append(y); ub.append(x)
                    sims.append(s)
        return pa.table(
            {
                "url_a": pa.array(ua, type=pa.string()),
                "url_b": pa.array(ub, type=pa.string()),
                "similarity": pa.array(sims, type=pa.float64()),
            },
            schema=out_schema,
        )

    cross = edges.select_columns(["url_a", "url_b", "similarity"]).map_batches(
        expand, batch_format="pyarrow"
    )

    # intra-class cliques (similarity 1.0 — always >= threshold): emit
    # from the class list distributed, chunked like _expand_cliques
    classes = [sorted(v) for v in groups.values() if len(v) >= 2]
    if not classes:
        return cross
    comp_t = pa.table({"members": pa.array(classes, type=pa.list_(pa.string()))})

    def cliques(batch: pa.Table):
        chunk = 1 << 16
        ua: list[np.ndarray] = []
        ub: list[np.ndarray] = []
        size = 0
        for lst in batch["members"].to_pylist():
            arr = np.asarray(lst)
            m = len(arr)
            for i in range(m - 1):
                ua.append(np.full(m - i - 1, arr[i]))
                ub.append(arr[i + 1 :])
                size += m - i - 1
                if size >= chunk:
                    a = np.concatenate(ua); b = np.concatenate(ub)
                    ua, ub, size = [], [], 0
                    yield pa.table(
                        {
                            "url_a": pa.array(a, type=pa.string()),
                            "url_b": pa.array(b, type=pa.string()),
                            "similarity": pa.array(np.ones(len(a))),
                        },
                        schema=out_schema,
                    )
        if size:
            a = np.concatenate(ua); b = np.concatenate(ub)
            yield pa.table(
                {
                    "url_a": pa.array(a, type=pa.string()),
                    "url_b": pa.array(b, type=pa.string()),
                    "similarity": pa.array(np.ones(len(a))),
                },
                schema=out_schema,
            )

    intra = ray.data.from_arrow(comp_t).map_batches(
        cliques, batch_format="pyarrow", batch_size=64
    )
    return cross.union(intra)
