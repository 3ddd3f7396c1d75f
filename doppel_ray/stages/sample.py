"""Deterministic hash-based sampling / split stages.

The right way to carve train/validation/test splits (or a profiling
sample) out of a 100 TB corpus: a pure ``map_batches`` filter on a
stable hash of a key column — no RNG state, no shuffle, no sort, and
the SAME rows are selected regardless of cluster size, block layout, or
run count (unlike ``Dataset.random_sample``). The hash is the md5-low64
used by the SimHash oracle mode (``functions.text.md5_token_hash64``),
so a DuckDB oracle reproduces the selection verbatim with
``md5_number_upper(key) % den < num``.

Mirrors the reference's determinism stance (stable group ids replacing
Go map iteration order, SURVEY.md G4): sampling decisions are a pure
function of the record key, never of execution order.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ray.data import Dataset

from doppel_ray.functions.text import md5_token_hash64


def _key_hashes(col: pa.Array, salt: str, method: str, den: int) -> np.ndarray:
    """Shared per-row hash bucket for all samplers — ONE definition, so
    the nesting invariant (a lower-rate sample is a subset of a
    higher-rate one for the same key/salt/method) cannot drift between
    the uniform and stratified paths."""
    if method == "sip64":
        import pandas as pd

        from doppel_ray.functions.hashing import sip64

        keys = col.cast(pa.string()).to_pandas()
        if salt:
            keys = keys + salt
        return sip64(pd.Series(keys)) % np.uint64(den)
    keys = np.asarray([str(v) + salt for v in col.to_pylist()], dtype=object)
    return md5_token_hash64(keys) % np.uint64(den)


def hash_sample(
    ds: Dataset,
    key_col: str,
    *,
    num: int,
    den: int = 1000,
    salt: str = "",
    invert: bool = False,
    method: str = "md5",
) -> Dataset:
    """Keep rows where ``hash64(str(key) + salt) % den < num`` — a
    deterministic ~num/den sample keyed on ``key_col``.

    ``invert=True`` keeps the complement, so
    ``hash_sample(ds, k, num=n)`` and ``hash_sample(ds, k, num=n,
    invert=True)`` are a disjoint, exhaustive train/heldout split.
    Different ``salt`` values draw independent samples.

    ``method="md5"`` is the SQL-oracle-reproducible hash (a Python md5
    per distinct key — fine for split decisions, not free);
    ``method="sip64"`` is the fully vectorized production path (same
    determinism guarantees, no SQL twin).
    """
    if not 0 <= num <= den:
        raise ValueError(f"num must be in [0, {den}], got {num}")

    def fn(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return batch
        h = _key_hashes(batch[key_col], salt, method, den)
        keep = h < np.uint64(num)
        if invert:
            keep = ~keep
        return batch.filter(pa.array(keep))

    return ds.map_batches(fn, batch_format="pyarrow")


def hash_split(
    ds: Dataset, key_col: str, *, num: int, den: int = 1000, salt: str = ""
) -> tuple[Dataset, Dataset]:
    """(sample, rest) disjoint split by the same deterministic rule."""
    return (
        hash_sample(ds, key_col, num=num, den=den, salt=salt),
        hash_sample(ds, key_col, num=num, den=den, salt=salt, invert=True),
    )


def stratified_hash_sample(
    ds: Dataset,
    key_col: str,
    stratum_col: str,
    rates: dict,
    *,
    default_num: int = 0,
    den: int = 1000,
    salt: str = "",
    method: str = "md5",
) -> Dataset:
    """Per-stratum deterministic hash sampling: keep a row when
    ``hash64(str(key) + salt) % den < rates[stratum]`` (``default_num``
    for strata not in ``rates``) — the corpus-rebalancing primitive
    (e.g. keep 50% of high-resource-language docs, 100% of rare ones)
    with the SAME guarantees as ``hash_sample``: no RNG, no shuffle,
    identical rows at any cluster size or block layout, and an exact
    DuckDB twin via CASE over ``md5_number_upper``.

    The per-row num is a vectorized lookup (strata are categorical and
    few); the hash pass is shared with the uniform sampler.
    """
    for stratum, num in rates.items():
        if not 0 <= num <= den:
            raise ValueError(
                f"rate for stratum {stratum!r} must be in [0, {den}], got {num}"
            )
    if not 0 <= default_num <= den:
        raise ValueError(
            f"default_num must be in [0, {den}], got {default_num}"
        )

    def fn(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return batch
        h = _key_hashes(batch[key_col], salt, method, den)
        strata = batch[stratum_col].to_pylist()
        nums = np.fromiter(
            (rates.get(s, default_num) for s in strata),
            dtype=np.uint64,
            count=len(strata),
        )
        return batch.filter(pa.array(h < nums))

    return ds.map_batches(fn, batch_format="pyarrow")


def weighted_sample(
    ds: Dataset,
    k: int,
    *,
    weight_col: str,
    key_col: str = "doc_id",
    salt: str = "",
) -> Dataset:
    """Deterministic weight-proportional sample WITHOUT replacement
    (Efraimidis & Spirakis 2006 order sampling, with the md5 hash in
    place of the RNG): per row ``u = (md5_low64(str(key) + salt) + 1) /
    2^64`` in (0, 1], order key ``skey = ln(u) / weight``, result = the
    global top-``k`` rows by ``(skey DESC, key)``.

    Maximizing ``ln(u)/w`` is monotone-equivalent to E-S's ``u^(1/w)``,
    so inclusion probabilities follow the classic without-replacement
    weighted scheme — but the draw is a pure function of the key, so the
    SAME rows are selected at any cluster size or block layout, and a
    DuckDB oracle reproduces the SELECTION. DuckDB's ``ln`` differs from
    libm by 1-2 ULP on these inputs (measured in tests/test_sample.py),
    so the float skey is engine-local — but adjacent order keys sit ~1e9
    ULPs apart at realistic cardinalities, far beyond last-bit wobble,
    so the selected set is stable across engines.

    Scale shape: one ``map_batches`` computes keys; selection is
    `rank.global_topk` — per-block prune to k, a k x blocks survivor
    union, corpus-size-independent shuffle volume. Weights must be > 0
    and non-null (raises per batch otherwise).
    """
    if k <= 0:
        raise ValueError("k must be positive")

    def add_key(batch: pa.Table) -> pa.Table:
        keys = np.asarray(
            [str(v) + salt for v in batch[key_col].to_pylist()], dtype=object
        )
        w = batch[weight_col].to_numpy(zero_copy_only=False).astype(
            np.float64
        )
        if np.any(~np.isfinite(w)) or np.any(w <= 0):
            raise ValueError(
                f"weighted_sample: {weight_col} must be finite and > 0"
            )
        h = md5_token_hash64(keys).astype(np.float64)
        u = (h + 1.0) / 18446744073709551616.0
        skey = np.log(u) / w
        return batch.append_column("skey", pa.array(skey, type=pa.float64()))

    from doppel_ray.stages.rank import global_topk

    keyed = ds.map_batches(add_key, batch_format="pyarrow")
    return global_topk(
        keyed, ["skey", key_col], ascending=[False, True], k=k
    )
