"""Text-analysis queries over the ``documents`` table: token counting,
quality scoring/filtering, language ID, and fingerprint-based dup
candidates. Every query carries a DuckDB oracle sharing the exact RE2
patterns (Arrow and DuckDB both use RE2, so counts agree verbatim);
float ratios compare bit-identically because each is a single
correctly-rounded IEEE operation on the same integers, evaluated in the
same order on both sides. Only ``media_features`` (binary payloads)
stays rows-only.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ray.data.aggregate import Count

from doppel_ray.functions import analysis as A
from doppel_ray.pipelines import finalize, query
from doppel_ray.sources.parquet import read_documents
from doppel_ray.stages import textstats


@query(
    "token_stats",
    rf"""
    SELECT doc_id,
           length(regexp_extract_all(text, '{A.WS_TOKEN_RE}')) AS n_tokens,
           length(regexp_extract_all(text, '{A.BPE_TOKEN_RE}')) AS n_bpe,
           length(regexp_extract_all(text, '{A.PUNCT_RE}')) AS n_punct
    FROM documents
    """,
)
def token_stats(sf_dir: str):
    """Per-doc token counts: whitespace tokens, BPE-ish coarse tokens,
    punctuation marks — identical RE2 patterns on both sides."""
    ds = read_documents(sf_dir, columns=["doc_id", "text"])

    def fn(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "doc_id": batch["doc_id"],
                "n_tokens": pa.array(A.token_counts(batch["text"], A.WS_TOKEN_RE)),
                "n_bpe": pa.array(A.token_counts(batch["text"], A.BPE_TOKEN_RE)),
                "n_punct": pa.array(A.token_counts(batch["text"], A.PUNCT_RE)),
            }
        )

    return finalize(
        ds.map_batches(fn, batch_format="pyarrow"),
        pa.schema(
            [
                ("doc_id", pa.int64()),
                ("n_tokens", pa.int64()),
                ("n_bpe", pa.int64()),
                ("n_punct", pa.int64()),
            ]
        ),
    )


@query(
    "quality_filter_count",
    rf"""
    SELECT count(*) AS kept
    FROM documents
    WHERE length(regexp_extract_all(text, '{A.WS_TOKEN_RE}')) >= 10
      AND 10 * length(regexp_extract_all(text, '{A.PUNCT_RE}')) <= length(text)
    """,
)
def quality_filter_count(sf_dir: str):
    """C4-style cheap quality gate (enough tokens, not punctuation soup),
    as integer arithmetic so the SQL oracle is float-free."""
    ds = read_documents(sf_dir, columns=["text"])

    def fn(batch: pa.Table) -> pa.Table:
        feats = A.quality_features(batch["text"])
        keep = (feats["n_tokens"] >= 10) & (
            10 * feats["n_punct"] <= feats["n_chars"]
        )
        return pa.table({"kept": pa.array([int(keep.sum())], type=pa.int64())})

    import pandas as pd

    parts = ds.map_batches(fn, batch_format="pyarrow").take_all()
    return pd.DataFrame({"kept": [sum(r["kept"] for r in parts)]})


@query(
    "quality_scores",
    # Float columns ARE oracle-compared (VERDICT r2 #3 shrink of the
    # no_oracle set): every ratio is a single IEEE-double division of
    # two integers and the composite is the same literal expression
    # tree left-to-right, so DuckDB and numpy produce bit-identical
    # doubles — identical RE2 token/punct/stopword patterns on both
    # sides (the proven token_stats technique).
    rf"""
    WITH f AS (
      SELECT doc_id,
             length(text)::BIGINT AS n_chars,
             strlen(text)::BIGINT AS n_bytes,
             length(regexp_extract_all(text, '{A.WS_TOKEN_RE}'))::BIGINT AS n_tokens,
             length(regexp_extract_all(text, '{A.PUNCT_RE}'))::BIGINT AS n_punct,
             length(regexp_extract_all(text, '{A._STOP_RE}'))::BIGINT AS n_stop
      FROM documents
    ),
    g AS (
      SELECT doc_id, n_chars, n_bytes, n_tokens, n_punct,
             CASE WHEN n_chars > 0 THEN n_punct / n_chars ELSE 0.0 END
               AS punct_ratio,
             CASE WHEN n_tokens > 0
                  THEN (n_chars - greatest(n_tokens - 1, 0)) / greatest(n_tokens, 1)
                  ELSE 0.0 END AS mean_token_len,
             CASE WHEN n_tokens > 0
                  THEN n_stop / greatest(n_tokens, 1)
                  ELSE 0.0 END AS stopword_ratio
      FROM f
    )
    SELECT doc_id, n_chars, n_bytes, n_tokens, n_punct, punct_ratio,
           mean_token_len, stopword_ratio,
           least(greatest(n_tokens / 50.0, 0.0), 1.0)
           * least(greatest(1.0 - 4.0 * punct_ratio, 0.0), 1.0)
           * (CASE WHEN mean_token_len >= 2.5 AND mean_token_len <= 12.0
                   THEN 1.0 ELSE 0.4 END) AS quality
    FROM g
    """,
)
def quality_scores(sf_dir: str):
    """Per-doc quality features and composite score."""
    ds = read_documents(sf_dir, columns=["doc_id", "text"])
    out = textstats.add_quality_columns(ds).drop_columns(["text"])
    return finalize(
        out,
        pa.schema(
            [
                ("doc_id", pa.int64()),
                ("n_chars", pa.int64()),
                ("n_bytes", pa.int64()),
                ("n_tokens", pa.int64()),
                ("n_punct", pa.int64()),
                ("punct_ratio", pa.float64()),
                ("mean_token_len", pa.float64()),
                ("stopword_ratio", pa.float64()),
                ("quality", pa.float64()),
            ]
        ),
    )


def _lang_id_sql() -> str:
    """DuckDB re-expression of ``analysis.lang_id`` built from the SAME
    marker profiles/regexes: per-language marker-hit rates as IEEE-double
    divisions, first-max-wins argmax in profile order (== np.argmax), the
    0.08 floor, then Cyrillic/CJK script overrides — every constant and
    pattern shared with the Python kernel so the heuristic cannot drift
    from its oracle."""
    langs = list(A._LANG_RES)
    scores = ",\n             ".join(
        f"length(regexp_extract_all(text, '{A._LANG_RES[lang]}'))"
        f" / greatest(length(regexp_extract_all(text, '{A.WS_TOKEN_RE}')), 1)"
        f" AS s_{lang}"
        for lang in langs
    )
    best = "greatest(" + ", ".join(f"s_{lang}" for lang in langs) + ")"
    argmax = "\n             ".join(
        f"WHEN s_{lang} = {best} THEN '{lang}'" for lang in langs
    )
    return rf"""
    WITH f AS (
      SELECT doc_id,
             {scores},
             length(regexp_extract_all(text, '{A._CJK_RE}'))
               / greatest(length(text), 1) AS cjk,
             length(regexp_extract_all(text, '{A._CYRILLIC_RE}'))
               / greatest(length(text), 1) AS cyr
      FROM documents
    ),
    pred AS (
      SELECT CASE
             WHEN cjk > 0.3 THEN 'zh'
             WHEN cyr > 0.3 THEN 'ru'
             WHEN {best} < 0.08 THEN 'und'
             {argmax}
             END AS lang_pred
      FROM f
    )
    SELECT lang_pred, count(*) AS n FROM pred GROUP BY lang_pred
    """


@query("lang_id_counts", _lang_id_sql())
def lang_id_counts(sf_dir: str):
    """Histogram of predicted languages. The heuristic is recomputed
    verbatim by the SQL oracle (``_lang_id_sql``); ACCURACY (vs labeled
    fixtures) is pinned separately in tests/test_analysis.py."""
    ds = read_documents(sf_dir, columns=["doc_id", "text"])
    pred = textstats.add_lang_id(ds).select_columns(["lang_pred"])
    return finalize(
        pred.groupby("lang_pred").aggregate(Count(alias_name="n")),
        pa.schema([("lang_pred", pa.string()), ("n", pa.int64())]),
    )


@query(
    "fingerprint_dup_groups",
    """
    SELECT min(doc_id) AS group_id, count(*) AS cnt
    FROM documents
    GROUP BY text
    HAVING count(*) > 1
    """,
)
def fingerprint_dup_groups(sf_dir: str):
    """Winnowing-fingerprint dup candidates, verified by full content
    hash so the surviving groups coincide with identical-text groups
    (the fingerprint is a pre-filter: identical texts always share a
    fingerprint, so verification loses nothing — same cascade shape as
    quick-hash -> full-hash, reference finder.go:68-106)."""
    from ray.data.aggregate import Min

    from doppel_ray.stages import exact, hashes

    ds = read_documents(sf_dir, columns=["doc_id", "text"])
    fp = textstats.add_fingerprints(ds)
    pruned = exact.prune_singletons(fp, "fingerprint")
    full = hashes.add_content_hash(pruned)
    g = full.groupby("content_hash").aggregate(
        Min("doc_id", alias_name="group_id"), Count(alias_name="cnt")
    )
    groups = g.filter(expr="cnt > 1").select_columns(["group_id", "cnt"])
    return finalize(
        groups, pa.schema([("group_id", pa.int64()), ("cnt", pa.int64())])
    )


@query(
    "doc_sample",
    # same md5-low64 hash on both sides (functions.text.md5_token_hash64
    # == DuckDB md5_number_upper), so the 5% sample is reproduced
    # verbatim — deterministic across runs, cluster sizes, and block
    # layouts, unlike RNG sampling
    """
    SELECT doc_id FROM documents
    WHERE md5_number_upper(CAST(doc_id AS VARCHAR)) % 1000 < 50
    """,
)
def doc_sample(sf_dir: str):
    """Deterministic 5% hash sample of documents keyed on doc_id
    (stages/sample.py) — the train/heldout split primitive."""
    from doppel_ray.stages.sample import hash_sample

    ds = read_documents(sf_dir, columns=["doc_id"])
    out = hash_sample(ds, "doc_id", num=50, den=1000)
    return finalize(out, pa.schema([("doc_id", pa.int64())]))


@query(
    "weighted_doc_sample",
    # Efraimidis-Spirakis order sampling with the md5 hash as the RNG:
    # both engines order by skey = ln((h+1)/2^64) / n_chars. DuckDB's ln
    # differs from libm by 1-2 ULP on these inputs (measured in
    # tests/test_sample.py), so the contract is the selected SET, not
    # the float: adjacent order keys at this cardinality are separated
    # by ~1e9 ULPs, so a last-bit wobble cannot flip the cut line.
    """
    SELECT doc_id, n_chars FROM (
      SELECT doc_id, n_chars,
             ln((CAST(md5_number_upper(CAST(doc_id AS VARCHAR)) AS DOUBLE)
                 + 1) / 18446744073709551616.0) / n_chars AS skey
      FROM documents
      ORDER BY skey DESC, doc_id
      LIMIT 25
    )
    """,
)
def weighted_doc_sample(sf_dir: str):
    """Deterministic length-weighted sample without replacement
    (stages/sample.py weighted_sample): 25 docs drawn proportional to
    n_chars via hash-seeded E-S order keys and the block-pruned global
    top-k — no RNG, no sort, layout-invariant."""
    from doppel_ray.stages.sample import weighted_sample

    ds = read_documents(sf_dir, columns=["doc_id", "n_chars"])
    out = weighted_sample(
        ds, 25, weight_col="n_chars", key_col="doc_id"
    ).drop_columns(["skey"])
    return finalize(
        out,
        pa.schema([("doc_id", pa.int64()), ("n_chars", pa.int64())]),
    )


@query(
    "term_doc_freq",
    rf"""
    WITH tok AS (
      SELECT DISTINCT doc_id,
             unnest(regexp_extract_all(lower(text), '{A.WS_TOKEN_RE}')) AS token
      FROM documents
    )
    SELECT token, count(*) AS df
    FROM tok GROUP BY token
    HAVING 10 * count(*) >= (SELECT count(*) FROM documents)
    """,
)
def term_doc_freq(sf_dir: str):
    """Document frequency of tokens appearing in >= 10% of docs — the
    inverted-index statistic. Combiner-first shape: each batch emits
    per-token DISTINCT-doc partial counts (a doc lives in exactly one
    batch row, so batch-local distinct is globally exact), then one
    small groupby sums partials — the shuffle carries (token, int), not
    the exploded token stream."""
    import pandas as pd

    from ray.data.aggregate import Sum

    ds = read_documents(sf_dir, columns=["doc_id", "text"])
    n_docs = ds.count()

    def partial(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        s = pc.utf8_lower(batch["text"]).to_pandas()
        toks = s.str.findall(A.WS_TOKEN_RE)
        flat = toks.explode().dropna()
        if flat.empty:
            return pa.table(
                {
                    "token": pa.array([], type=pa.string()),
                    "df": pa.array([], type=pa.int64()),
                }
            )
        df = pd.DataFrame({"doc": flat.index, "token": flat.to_numpy()})
        counts = df.drop_duplicates().groupby("token", sort=False).size()
        return pa.table(
            {
                "token": pa.array(counts.index, type=pa.string()),
                "df": pa.array(counts.to_numpy(), type=pa.int64()),
            }
        )

    agg = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("token")
        .aggregate(Sum("df", alias_name="df"))
        .filter(expr=f"df >= {(n_docs + 9) // 10}")  # == 10*df >= n_docs
    )
    return finalize(
        agg, pa.schema([("token", pa.string()), ("df", pa.int64())])
    )


@query(
    "token_quantiles",
    rf"""
    WITH f AS (
      SELECT length(regexp_extract_all(text, '{A.WS_TOKEN_RE}'))::BIGINT
               AS n_tokens
      FROM documents
    )
    SELECT 'p25' AS q, quantile_disc(n_tokens, 0.25) AS v FROM f
    UNION ALL SELECT 'p50', quantile_disc(n_tokens, 0.5) FROM f
    UNION ALL SELECT 'p75', quantile_disc(n_tokens, 0.75) FROM f
    UNION ALL SELECT 'p90', quantile_disc(n_tokens, 0.9) FROM f
    UNION ALL SELECT 'p99', quantile_disc(n_tokens, 0.99) FROM f
    """,
)
def token_quantiles(sf_dir: str):
    """Exact token-count quantiles via the histogram shuffle
    (stages/quantiles.py) — matches DuckDB quantile_disc index-for-index."""
    from doppel_ray.stages.quantiles import exact_quantiles

    ds = read_documents(sf_dir, columns=["text"])

    def add_tokens(batch: pa.Table) -> pa.Table:
        return pa.table(
            {"n_tokens": pa.array(A.token_counts(batch["text"]), type=pa.int64())}
        )

    qs = exact_quantiles(
        ds.map_batches(add_tokens, batch_format="pyarrow"),
        "n_tokens",
        [0.25, 0.5, 0.75, 0.9, 0.99],
    )
    labels = {0.25: "p25", 0.5: "p50", 0.75: "p75", 0.9: "p90", 0.99: "p99"}
    return pa.table(
        {
            "q": pa.array([labels[p] for p, _ in qs], type=pa.string()),
            "v": pa.array([v for _, v in qs], type=pa.int64()),
        }
    )


@query(
    "top_sources_by_lang",
    """
    SELECT lang, source, n FROM (
      SELECT lang, source, count(*) AS n FROM documents GROUP BY 1, 2
    )
    QUALIFY row_number() OVER (
      PARTITION BY lang ORDER BY n DESC, source
    ) <= 3
    """,
)
def top_sources_by_lang(sf_dir: str):
    """Per-group top-k: the 3 most frequent sources per language
    (count-desc, source-asc tiebreak) — grouped count shuffle, then a
    bucketed per-lang head over the tiny counts table."""
    import pandas as pd

    from ray.data.aggregate import Count

    from doppel_ray.stages.exact import bucketed_group_apply

    ds = read_documents(sf_dir, columns=["lang", "source"])
    counts = ds.groupby(["lang", "source"]).aggregate(Count(alias_name="n"))
    out_schema = pa.schema(
        [("lang", pa.string()), ("source", pa.string()), ("n", pa.int64())]
    )

    def topk(g: pa.Table) -> pa.Table:
        if g.num_rows == 0:
            return out_schema.empty_table()
        df = (
            g.to_pandas()
            .sort_values(["lang", "n", "source"], ascending=[True, False, True])
            .groupby("lang", sort=False)
            .head(3)
        )
        return pa.Table.from_pandas(
            df[["lang", "source", "n"]], preserve_index=False
        ).cast(out_schema)

    top = bucketed_group_apply(counts, "lang", topk, num_buckets=8)
    return finalize(top, out_schema)


#: pinned blake2b-128 digest of the media_features result (feature
#:  matrix + dims over the in-query deterministic RAWI fixture). The
#: decode/resize/featurize chain is fully deterministic, so any change
#: to its numerics shows up as a digest mismatch the DRIVER sees (the
#: query raises), not just a test (VERDICT r3 #5). After an INTENTIONAL
#: numerics change, recompute by folding the new result's (media_id,
#: feat_hash) pairs exactly as the query does and re-pin.
MEDIA_FEATURES_DIGEST = "2dda0975630c2bbf4cd3d5521fff1670"


@query("media_features")  # rows-only: binary payloads, no SQL analog
def media_features(sf_dir: str):
    """Multimodal plumbing end-to-end: deterministic synthetic RAWI
    payloads (binary column + typed metadata) through the actor-pool
    decode -> resize -> featurize stages; returns (media_id, height,
    width, channels, feat, feat_hash) with a stable schema.

    ``feat_hash`` is a per-row blake2b-128 over the float32 feature
    bytes + dims — a driver-visible checksum; the whole-result digest is
    additionally asserted against ``MEDIA_FEATURES_DIGEST``."""
    import hashlib

    import ray.data as rd

    from doppel_ray.stages import multimodal as M

    n = 48
    t = pa.table(
        {
            "media_id": pa.array([f"m{i:04d}" for i in range(n)]),
            "image": pa.array(
                [
                    M.fake_image_bytes(16 + (i % 4) * 8, 16 + (i % 3) * 8, 3, seed=i)
                    for i in range(n)
                ],
                type=pa.binary(),
            ),
            "media_type": pa.array(["image/rawi"] * n),
        }
    )
    out = M.decode_resize_featurize(
        rd.from_arrow(t), M.MediaPipelineConfig(concurrency=2)
    ).drop_columns(["pixels"])
    rows = out.take_all()
    rows.sort(key=lambda r: r["media_id"])

    import numpy as np

    def row_hash(r) -> str:
        payload = (
            np.asarray(r["feat"], dtype=np.float32).tobytes()
            + np.asarray(
                [r["height"], r["width"], r["channels"]], dtype=np.int64
            ).tobytes()
        )
        return hashlib.blake2b(payload, digest_size=16).hexdigest()

    hashes = [row_hash(r) for r in rows]
    agg = hashlib.blake2b(digest_size=16)
    for r, h in zip(rows, hashes):
        agg.update(r["media_id"].encode())
        agg.update(bytes.fromhex(h))
    digest = agg.hexdigest()
    if MEDIA_FEATURES_DIGEST != "PINNED_AT_IMPORT" and digest != MEDIA_FEATURES_DIGEST:
        raise RuntimeError(
            f"media_features determinism contract violated: digest {digest} "
            f"!= pinned {MEDIA_FEATURES_DIGEST}"
        )
    return pa.table(
        {
            "media_id": pa.array([r["media_id"] for r in rows]),
            "height": pa.array([r["height"] for r in rows], type=pa.int64()),
            "width": pa.array([r["width"] for r in rows], type=pa.int64()),
            "channels": pa.array([r["channels"] for r in rows], type=pa.int64()),
            "feat": pa.array([list(map(float, r["feat"])) for r in rows], type=pa.list_(pa.float32())),
            "feat_hash": pa.array(hashes, type=pa.string()),
        }
    )


@query(
    "contaminated_docs",
    rf"""
    WITH toks AS (
      SELECT doc_id, regexp_extract_all(text, '{A.WS_TOKEN_RE}') AS tk
      FROM documents
    ),
    bg AS (
      SELECT DISTINCT array_to_string(tk[i:i+2], ' ') AS g
      FROM toks, UNNEST(generate_series(1, greatest(len(tk)-2, 0))) AS u(i)
      WHERE doc_id % 50 = 0
    )
    SELECT DISTINCT t.doc_id AS doc_id
    FROM toks t, UNNEST(generate_series(1, greatest(len(t.tk)-2, 0))) AS u(i)
    WHERE t.doc_id % 50 <> 0
      AND array_to_string(t.tk[u.i:u.i+2], ' ') IN (SELECT g FROM bg)
    """,
)
def contaminated_docs(sf_dir: str):
    """Benchmark decontamination (stages/decontam.py): docs sharing any
    token n-gram with the held-out benchmark slice (doc_id % 50 == 0
    plays the eval suite). n=3 here so the check is non-vacuous at the
    driver's sf0.01; the shipping n=8 path is pinned non-vacuously in
    tests/test_decontam.py."""
    import pyarrow.compute as pc

    from doppel_ray.stages import decontam

    ds = read_documents(sf_dir, columns=["doc_id", "text"])

    def side(is_bench: bool):
        def fn(batch: pa.Table) -> pa.Table:
            ids = batch["doc_id"].to_numpy(zero_copy_only=False)
            m = (ids % 50) == 0
            return batch.filter(pa.array(m if is_bench else ~m))

        return fn

    bench = ds.map_batches(side(True), batch_format="pyarrow")
    train = ds.map_batches(side(False), batch_format="pyarrow")
    return decontam.contaminated_ids(
        train, bench, id_col="doc_id", text_col="text", n=3
    )


@query(
    "repetition_scores",
    # Gopher repetition rules (Rae et al. 2021 A1.1, token-count
    # variant): per doc, the duplicated-2-gram occurrence fraction and
    # the top-2-gram occurrence share. Single exact-int division per
    # value on both sides -> bit-identical doubles (the quality_scores
    # technique). Docs with <2 tokens have no 2-grams and no row.
    rf"""
    WITH toks AS (
      SELECT doc_id, regexp_extract_all(text, '{A.WS_TOKEN_RE}') AS tk
      FROM documents
    ),
    g AS (
      SELECT doc_id, array_to_string(tk[i:i+1], ' ') AS g2
      FROM toks, UNNEST(generate_series(1, greatest(len(tk)-1, 0))) AS u(i)
    ),
    c AS (SELECT doc_id, g2, count(*) AS c FROM g GROUP BY 1, 2),
    agg AS (
      SELECT doc_id,
             sum(c) AS tot,
             sum(CASE WHEN c > 1 THEN c ELSE 0 END) AS dup,
             max(c) AS mx
      FROM c GROUP BY 1
    )
    SELECT doc_id,
           dup / tot AS dup_2gram_frac,
           mx / tot AS top_2gram_frac
    FROM agg
    """,
)
def repetition_scores(sf_dir: str):
    """Per-doc Gopher repetition signals (stages/textstats.py
    repetition_features — factorize-code exact counting, no hashing)."""
    from doppel_ray.stages import textstats

    ds = read_documents(sf_dir, columns=["doc_id", "text"])
    out = textstats.add_repetition_columns(ds, n=2)

    def project(batch: pa.Table) -> pa.Table:
        t = batch.filter(batch["has_ngrams"])
        return t.select(["doc_id", "dup_2gram_frac", "top_2gram_frac"])

    return finalize(
        out.map_batches(project, batch_format="pyarrow"),
        pa.schema(
            [
                ("doc_id", pa.int64()),
                ("dup_2gram_frac", pa.float64()),
                ("top_2gram_frac", pa.float64()),
            ]
        ),
    )


@query(
    "lang_stratified_sample",
    # per-stratum CASE over the same md5-low64 rule as doc_sample: the
    # corpus-rebalancing primitive (downsample the dominant language,
    # keep the rare ones whole) reproduced verbatim by SQL
    """
    SELECT doc_id, lang FROM documents
    WHERE md5_number_upper(CAST(doc_id AS VARCHAR)) % 1000 <
          CASE lang WHEN 'en' THEN 300 WHEN 'de' THEN 700 ELSE 1000 END
    """,
)
def lang_stratified_sample(sf_dir: str):
    """Deterministic per-language stratified sample (stages/sample.py
    stratified_hash_sample): 30% of English, 70% of German, 100% of
    everything else, keyed on doc_id."""
    from doppel_ray.stages.sample import stratified_hash_sample

    ds = read_documents(sf_dir, columns=["doc_id", "lang"])
    out = stratified_hash_sample(
        ds, "doc_id", "lang", {"en": 300, "de": 700}, default_num=1000
    )
    return finalize(
        out, pa.schema([("doc_id", pa.int64()), ("lang", pa.string())])
    )


@query(
    "doc_chunks",
    # context-window packing: non-overlapping 32-token windows; the
    # chunk text rule (tokens re-joined with single spaces) is shared
    # verbatim with stages/textstats.py chunk_documents
    rf"""
    WITH toks AS (
      SELECT doc_id, regexp_extract_all(text, '{A.WS_TOKEN_RE}') AS tk
      FROM documents
    )
    SELECT doc_id,
           (i - 1) // 32 AS chunk_idx,
           least(i + 31, len(tk)) - i + 1 AS n_tokens,
           array_to_string(tk[i:least(i + 31, len(tk))], ' ') AS chunk_text
    FROM toks, UNNEST(generate_series(1, len(tk), 32)) AS u(i)
    """,
)
def doc_chunks(sf_dir: str):
    """Documents split into fixed 32-token training chunks
    (stages/textstats.py chunk_documents — one map_batches row
    expansion, no shuffle)."""
    from doppel_ray.stages import textstats

    ds = read_documents(sf_dir, columns=["doc_id", "text"])
    return finalize(
        textstats.chunk_documents(ds, chunk_tokens=32),
        pa.schema(
            [
                ("doc_id", pa.int64()),
                ("chunk_idx", pa.int64()),
                ("n_tokens", pa.int64()),
                ("chunk_text", pa.string()),
            ]
        ),
    )


# Deterministic per-doc augmentation shared by the PII and boilerplate
# queries: the synthetic documents carry no emails/phones/IPs and no
# newlines, so each query derives its test surface FROM the data with
# the same expression on both sides (Ray and SQL) — the contaminated_docs
# technique — making the driver check non-vacuous by construction.


def _pii_augment_sql() -> str:
    return (
        "text || ' contact user' || CAST(doc_id AS VARCHAR) || '@ex' || "
        "CAST(doc_id % 7 AS VARCHAR) || '.org ip 10.' || "
        "CAST(doc_id % 256 AS VARCHAR) || '.0.1 tel 415-555-' || "
        "lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0')"
    )


@query(
    "pii_masked",
    rf"""
    WITH aug AS (
      SELECT doc_id, {_pii_augment_sql()} AS t FROM documents
    )
    SELECT doc_id,
           regexp_replace(regexp_replace(regexp_replace(t,
             '{A.EMAIL_RE}', '<EMAIL>', 'g'),
             '{A.PHONE_RE}', '<PHONE>', 'g'),
             '{A.IPV4_RE}', '<IP>', 'g') AS masked,
           length(regexp_extract_all(t, '{A.EMAIL_RE}'))::BIGINT AS n_email,
           length(regexp_extract_all(t, '{A.PHONE_RE}'))::BIGINT AS n_phone,
           length(regexp_extract_all(t, '{A.IPV4_RE}'))::BIGINT AS n_ip
    FROM aug
    """,
)
def pii_masked(sf_dir: str):
    """PII redaction (functions/analysis.py PII_RULES): typed
    placeholders for emails, dashed phone numbers and IPv4 addresses,
    plus per-doc match counts — identical RE2 patterns and replacement
    order on both sides. One vectorized replace per rule, no shuffle."""
    ds = read_documents(sf_dir, columns=["doc_id", "text"])

    def fn(batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_pandas()
        aug = (
            batch["text"].to_pandas()
            + " contact user"
            + ids.astype(str)
            + "@ex"
            + (ids % 7).astype(str)
            + ".org ip 10."
            + (ids % 256).astype(str)
            + ".0.1 tel 415-555-"
            + (ids % 10000).astype(str).str.zfill(4)
        )
        t = pa.array(aug, type=pa.string())
        counts = A.pii_counts(t)
        return pa.table(
            {
                "doc_id": batch["doc_id"],
                "masked": A.mask_pii(t),
                "n_email": pa.array(counts["n_email"]),
                "n_phone": pa.array(counts["n_phone"]),
                "n_ip": pa.array(counts["n_ip"]),
            }
        )

    return finalize(
        ds.map_batches(fn, batch_format="pyarrow"),
        pa.schema(
            [
                ("doc_id", pa.int64()),
                ("masked", pa.string()),
                ("n_email", pa.int64()),
                ("n_phone", pa.int64()),
                ("n_ip", pa.int64()),
            ]
        ),
    )


@query(
    "boilerplate_lines",
    """
    WITH aug AS (
      SELECT doc_id,
             'NAV HOME LOGIN' || chr(10) || text || chr(10) ||
             'FOOTER SECTION ' || CAST(doc_id % 3 AS VARCHAR) || chr(10) ||
             'UNIQUE TAIL ' || CAST(doc_id AS VARCHAR) AS t
      FROM documents
    ),
    ls AS (SELECT doc_id, string_split(t, chr(10)) AS ls FROM aug),
    lines AS (
      SELECT doc_id, i AS pos, ls[i] AS line
      FROM ls, UNNEST(generate_series(1, len(ls))) AS u(i)
    ),
    freq AS (
      SELECT line FROM lines WHERE line <> ''
      GROUP BY line HAVING count(DISTINCT doc_id) >= 2
    ),
    marked AS (
      SELECT l.doc_id, l.pos, l.line, f.line IS NOT NULL AS is_freq
      FROM lines l LEFT JOIN freq f ON l.line = f.line
    )
    SELECT doc_id,
           coalesce(
             string_agg(CASE WHEN NOT is_freq THEN line END,
                        chr(10) ORDER BY pos), '') AS text_clean,
           sum(CASE WHEN is_freq THEN 1 ELSE 0 END)::BIGINT AS n_removed
    FROM marked
    GROUP BY doc_id
    """,
)
def boilerplate_lines(sf_dir: str):
    """Line-level boilerplate dedup (stages/linededup.py): non-empty
    lines appearing in >= 2 distinct documents are stripped, the doc is
    reassembled, and the removed-line count reported. The nav/footer
    lines injected identically on both sides play the repeated
    boilerplate (df 500 and ~N/3 at sf0.01); each doc's body line and
    unique tail survive."""
    from doppel_ray.stages import linededup

    ds = read_documents(sf_dir, columns=["doc_id", "text"])

    def augment(batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_pandas()
        aug = (
            "NAV HOME LOGIN\n"
            + batch["text"].to_pandas()
            + "\nFOOTER SECTION "
            + (ids % 3).astype(str)
            + "\nUNIQUE TAIL "
            + ids.astype(str)
        )
        return pa.table(
            {"doc_id": batch["doc_id"], "text": pa.array(aug, type=pa.string())}
        )

    aug_ds = ds.map_batches(augment, batch_format="pyarrow")
    out = linededup.remove_boilerplate_lines(aug_ds, min_docs=2).select_columns(
        ["doc_id", "text_clean", "n_removed"]
    )
    return finalize(
        out,
        pa.schema(
            [
                ("doc_id", pa.int64()),
                ("text_clean", pa.string()),
                ("n_removed", pa.int64()),
            ]
        ),
    )


@query(
    "line_dedup_keepfirst",
    """
    WITH aug AS (
      SELECT doc_id,
             'PROMO SHARED LINE' || chr(10) ||
             'REPEAT ' || CAST(doc_id % 7 AS VARCHAR) || chr(10) ||
             'REPEAT ' || CAST(doc_id % 7 AS VARCHAR) || chr(10) ||
             text AS t
      FROM documents
    ),
    ls AS (SELECT doc_id, string_split(t, chr(10)) AS ls FROM aug),
    lines AS (
      SELECT doc_id, i AS pos, ls[i] AS line
      FROM ls, UNNEST(generate_series(1, len(ls))) AS u(i)
    ),
    marked AS (
      SELECT doc_id, pos, line,
             count(*) OVER (PARTITION BY line) AS cnt,
             row_number() OVER (
               PARTITION BY line ORDER BY doc_id, pos
             ) AS rn
      FROM lines
    )
    SELECT doc_id,
           coalesce(
             string_agg(
               CASE WHEN line = '' OR cnt = 1 OR rn = 1 THEN line END,
               chr(10) ORDER BY pos), '') AS text_clean,
           sum(CASE WHEN line <> '' AND cnt > 1 AND rn > 1
                    THEN 1 ELSE 0 END)::BIGINT AS n_removed
    FROM marked
    GROUP BY doc_id
    """,
)
def line_dedup_keepfirst(sf_dir: str):
    """C4 keep-first line dedup (stages/linededup.dedup_lines_keep_first):
    a duplicated non-empty line keeps exactly its first occurrence by
    (doc_id, pos) and loses the rest. The deterministic augment plants
    one corpus-wide shared line (kept only by the min doc_id), an
    intra-doc repeat (second copy always removed), and a mod-7 family
    line (one survivor among ~2N/7 occurrences), exercising inter-doc,
    intra-doc, and grouped duplication on both sides identically."""
    from doppel_ray.stages import linededup

    ds = read_documents(sf_dir, columns=["doc_id", "text"])

    def augment(batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_pandas()
        rep = "REPEAT " + (ids % 7).astype(str)
        aug = (
            "PROMO SHARED LINE\n"
            + rep + "\n" + rep + "\n"
            + batch["text"].to_pandas()
        )
        return pa.table(
            {"doc_id": batch["doc_id"], "text": pa.array(aug, type=pa.string())}
        )

    aug_ds = ds.map_batches(augment, batch_format="pyarrow")
    out = linededup.dedup_lines_keep_first(aug_ds).select_columns(
        ["doc_id", "text_clean", "n_removed"]
    )
    return finalize(
        out,
        pa.schema(
            [
                ("doc_id", pa.int64()),
                ("text_clean", pa.string()),
                ("n_removed", pa.int64()),
            ]
        ),
    )


@query(
    "url_dup_groups",
    # Canonicalization computed GENERICALLY in SQL (same five rules as
    # functions/urls.py, not the expected constants), over crawl-alias
    # URL variants derived identically on both sides from doc_id: four
    # aliases (default port + trailing slash + param order + fragment +
    # case) of the same logical page per doc_id // 4.
    r"""
    WITH aug AS (
      SELECT doc_id,
             CASE doc_id % 4
               WHEN 0 THEN 'http://Example.com:80/page/' || CAST(doc_id // 4 AS VARCHAR) || '/?b=2&a=1'
               WHEN 1 THEN 'HTTP://example.COM/page/' || CAST(doc_id // 4 AS VARCHAR) || '?a=1&b=2'
               WHEN 2 THEN 'http://example.com/page/' || CAST(doc_id // 4 AS VARCHAR) || '//?b=2&a=1#frag'
               ELSE 'http://example.com/page/' || CAST(doc_id // 4 AS VARCHAR) || '?a=1&b=2'
             END AS u
      FROM documents
    ),
    nofrag AS (SELECT doc_id, regexp_replace(u, '#.*$', '') AS u FROM aug),
    parts AS (
      SELECT doc_id,
        lower(regexp_extract(u, '^([A-Za-z][A-Za-z0-9+.-]*)://', 1)) AS scheme,
        lower(regexp_extract(u, '^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]*)', 1)) AS auth,
        regexp_extract(u, '^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*([^?]*)', 1) AS pth,
        CASE WHEN strpos(u, '?') > 0 THEN regexp_extract(u, '\?(.*)$', 1) END AS q
      FROM nofrag
    ),
    norm AS (
      SELECT doc_id, scheme,
        CASE WHEN scheme = 'http' THEN regexp_replace(auth, ':80$', '')
             WHEN scheme = 'https' THEN regexp_replace(auth, ':443$', '')
             ELSE auth END AS auth,
        CASE WHEN regexp_replace(pth, '/+$', '') = '' THEN '/'
             ELSE regexp_replace(pth, '/+$', '') END AS pth,
        q
      FROM parts
    ),
    canon AS (
      SELECT doc_id,
        scheme || '://' || auth || pth ||
        CASE WHEN q IS NOT NULL
             THEN '?' || array_to_string(list_sort(string_split(q, '&')), '&')
             ELSE '' END AS canon_url
      FROM norm
    )
    SELECT canon_url, min(doc_id) AS first_id, count(*)::BIGINT AS cnt
    FROM canon GROUP BY canon_url
    """,
)
def url_dup_groups(sf_dir: str):
    """URL-level dedup via canonicalization (functions/urls.py): crawl
    aliases of the same page collapse to one canonical URL; groups keyed
    on it with first-seen id and member count. One vectorized
    canonicalize pass + a narrow canonical-URL groupby."""
    from doppel_ray.functions import urls as U

    ds = read_documents(sf_dir, columns=["doc_id"])

    def fn(batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_pandas()
        variant = (ids % 4).to_numpy()
        page = (ids // 4).astype(str)
        raw = np.select(
            [variant == 0, variant == 1, variant == 2],
            [
                "http://Example.com:80/page/" + page + "/?b=2&a=1",
                "HTTP://example.COM/page/" + page + "?a=1&b=2",
                "http://example.com/page/" + page + "//?b=2&a=1#frag",
            ],
            default="http://example.com/page/" + page + "?a=1&b=2",
        )
        return pa.table(
            {
                "doc_id": batch["doc_id"],
                "canon_url": U.canonicalize_urls(pa.array(raw, type=pa.string())),
            }
        )

    from ray.data.aggregate import Min

    g = (
        ds.map_batches(fn, batch_format="pyarrow")
        .groupby("canon_url")
        .aggregate(Min("doc_id", alias_name="first_id"), Count(alias_name="cnt"))
    )
    return finalize(
        g,
        pa.schema(
            [
                ("canon_url", pa.string()),
                ("first_id", pa.int64()),
                ("cnt", pa.int64()),
            ]
        ),
    )


@query(
    "span_dup_groups",
    # C4 three-line-span dedup detection over pages derived identically
    # on both sides from doc_id: a corpus-wide duplicated intro span
    # (every doc), a per-(doc_id % 7) duplicated tail span, and unique
    # middle windows that must NOT appear. DuckDB list slicing is
    # 1-based inclusive: ls[i:i+2] is the 3-line window at i.
    r"""
    WITH aug AS (
      SELECT doc_id,
             'SPAN X' || chr(10) || 'SPAN Y' || chr(10) || 'SPAN Z'
             || chr(10) || text || chr(10) ||
             'TAIL ' || CAST(doc_id % 7 AS VARCHAR) || chr(10) ||
             'END A' || chr(10) || 'END B' AS t
      FROM documents
    ),
    ls AS (SELECT doc_id, string_split(t, chr(10)) AS ls FROM aug),
    spans AS (
      SELECT doc_id, i - 1 AS pos,
             array_to_string(ls[i:i+2], chr(10)) AS span
      FROM ls, UNNEST(generate_series(1, len(ls) - 2)) AS u(i)
    ),
    g AS (
      SELECT span, count(*)::BIGINT AS cnt,
             min(lpad(CAST(doc_id AS VARCHAR), 19, '0') || ':' ||
                 lpad(CAST(pos AS VARCHAR), 7, '0')) AS fk
      FROM spans GROUP BY span HAVING count(*) > 1
    )
    SELECT span, cnt,
           CAST(split_part(fk, ':', 1) AS BIGINT) AS first_doc,
           CAST(split_part(fk, ':', 2) AS BIGINT) AS first_pos
    FROM g
    """,
)
def span_dup_groups(sf_dir: str):
    """C4 three-line-span duplicate detection (stages/linededup.py
    dup_span_groups): every 3-consecutive-line window repeated anywhere
    in the corpus, with count and deterministic first occurrence."""
    from doppel_ray.stages import linededup

    ds = read_documents(sf_dir, columns=["doc_id", "text"])

    def augment(batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_pandas()
        t = (
            "SPAN X\nSPAN Y\nSPAN Z\n"
            + batch["text"].to_pandas()
            + "\nTAIL "
            + (ids % 7).astype(str)
            + "\nEND A\nEND B"
        )
        return pa.table(
            {"doc_id": batch["doc_id"], "text": pa.array(t, type=pa.string())}
        )

    out = linededup.dup_span_groups(
        ds.map_batches(augment, batch_format="pyarrow")
    )
    return finalize(
        out,
        pa.schema(
            [
                ("span", pa.string()),
                ("cnt", pa.int64()),
                ("first_doc", pa.int64()),
                ("first_pos", pa.int64()),
            ]
        ),
    )


@query(
    "oov_scores",
    # Vocabulary-coverage quality signal: reference vocab = tokens in
    # >= 2 distinct EVEN documents; every doc scored for OOV tokens.
    # Both sides append a per-doc unique token (' uniq<id>') so n_oov
    # is non-vacuously > 0 for every doc (df=1 < min_df). oov_rate is a
    # single int/int IEEE division on both sides (bit-identical, the
    # quality_scores technique).
    rf"""
    WITH aug AS (
      SELECT doc_id,
             text || ' uniq' || CAST(doc_id AS VARCHAR) AS t
      FROM documents
    ),
    tok AS (
      SELECT doc_id, unnest(regexp_extract_all(t, '{A.WS_TOKEN_RE}')) AS s
      FROM aug
    ),
    vocab AS (
      SELECT s FROM tok WHERE doc_id % 2 = 0
      GROUP BY s HAVING count(DISTINCT doc_id) >= 2
    ),
    per AS (
      SELECT t.doc_id,
             count(*) AS n_tokens,
             sum(CASE WHEN v.s IS NULL THEN 1 ELSE 0 END) AS n_oov
      FROM tok t LEFT JOIN vocab v ON t.s = v.s
      GROUP BY t.doc_id
    )
    SELECT d.doc_id,
           coalesce(p.n_tokens, 0)::BIGINT AS n_tokens,
           coalesce(p.n_oov, 0)::BIGINT AS n_oov,
           CASE WHEN coalesce(p.n_tokens, 0) = 0 THEN 0.0
                ELSE coalesce(p.n_oov, 0)::DOUBLE / p.n_tokens::DOUBLE
           END AS oov_rate
    FROM documents d LEFT JOIN per p ON d.doc_id = p.doc_id
    """,
)
def oov_scores(sf_dir: str):
    """OOV-rate scoring (stages/vocab.py): reference vocabulary built
    from the even half of the corpus (distinct-doc frequency >= 2,
    broadcast once — bounded by vocabulary size, not corpus size), then
    one vectorized is_in pass scores every document."""
    import pyarrow.compute as pc

    from doppel_ray.stages import vocab as V

    ds = read_documents(sf_dir, columns=["doc_id", "text"])

    def augment(batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_pandas()
        t = batch["text"].to_pandas() + " uniq" + ids.astype(str)
        return pa.table(
            {"doc_id": batch["doc_id"], "text": pa.array(t, type=pa.string())}
        )

    aug = ds.map_batches(augment, batch_format="pyarrow")

    def evens(batch: pa.Table) -> pa.Table:
        return batch.filter(
            pc.equal(pc.bit_wise_and(batch["doc_id"], 1), 0)
        )

    voc = V.reference_vocab(
        aug.map_batches(evens, batch_format="pyarrow"), min_df=2
    )
    out = V.add_oov_columns(aug, voc).select_columns(
        ["doc_id", "n_tokens", "n_oov", "oov_rate"]
    )
    return finalize(
        out,
        pa.schema(
            [
                ("doc_id", pa.int64()),
                ("n_tokens", pa.int64()),
                ("n_oov", pa.int64()),
                ("oov_rate", pa.float64()),
            ]
        ),
    )


@query(
    "pack_sequences",
    # GPT-style concat-then-split sequence packing: the corpus token
    # stream in doc_id order cut into 512-token training sequences; one
    # row per (doc, sequence) overlap with exact token spans. All-int
    # arithmetic, so the hash comparison is exact. DuckDB's windowed
    # sum returns HUGEINT -> cast to BIGINT.
    rf"""
    WITH n AS (
      SELECT doc_id,
             length(regexp_extract_all(text, '{A.WS_TOKEN_RE}'))::BIGINT AS n
      FROM documents
    ),
    c AS (
      SELECT doc_id, n, (sum(n) OVER (ORDER BY doc_id))::BIGINT AS c
      FROM n WHERE n > 0
    ),
    x AS (
      SELECT doc_id, n, c, u.seq_id
      FROM c, UNNEST(generate_series((c - n) // 512,
                                     (c - 1) // 512)) AS u(seq_id)
    )
    SELECT doc_id, seq_id,
           greatest(c - n, seq_id * 512) - (c - n) AS doc_tok_start,
           least(c, (seq_id + 1) * 512) - (c - n) AS doc_tok_end,
           greatest(c - n, seq_id * 512) - seq_id * 512 AS seq_tok_start
    FROM x
    """,
)
def pack_sequences(sf_dir: str):
    """Token-stream sequence packing (stages/packing.py): assign every
    document's whitespace tokens to consecutive 512-token training
    sequences via a distributed prefix sum; documents straddle sequence
    boundaries (no padding)."""
    from doppel_ray.stages import packing

    ds = read_documents(sf_dir, columns=["doc_id", "text"])
    out = packing.pack_token_stream(ds, seq_tokens=512)
    return finalize(
        out,
        pa.schema(
            [
                ("doc_id", pa.int64()),
                ("seq_id", pa.int64()),
                ("doc_tok_start", pa.int64()),
                ("doc_tok_end", pa.int64()),
                ("seq_tok_start", pa.int64()),
            ]
        ),
    )


@query(
    "tfidf_top_terms",
    # Per-document top-5 TF-IDF terms. Bit-exact float parity: idf is
    # ln(N/df) with N = count(*) — one IEEE divide + libm log on both
    # sides (driver math.log == DuckDB ln; see stages/tfidf.py) — and
    # tfidf = tf * idf is one correctly-rounded multiply. Tie-break is
    # binary collation (UTF-8 memcmp == codepoint order) on both sides.
    rf"""
    WITH tok AS (
      SELECT doc_id, unnest(regexp_extract_all(text, '{A.WS_TOKEN_RE}')) AS s
      FROM documents
    ),
    tf AS (
      SELECT doc_id, s, count(*)::BIGINT AS tf FROM tok GROUP BY doc_id, s
    ),
    dfq AS (
      SELECT s, count(DISTINCT doc_id)::BIGINT AS df FROM tok GROUP BY s
    ),
    nq AS (SELECT count(*)::DOUBLE AS n FROM documents),
    sc AS (
      SELECT tf.doc_id, tf.s AS token, tf.tf, dfq.df,
             tf.tf * ln(n / dfq.df::DOUBLE) AS tfidf,
             row_number() OVER (
               PARTITION BY tf.doc_id
               ORDER BY tf.tf * ln(n / dfq.df::DOUBLE) DESC, tf.s ASC
             ) AS rk
      FROM tf JOIN dfq USING (s), nq
    )
    SELECT doc_id, token, tf, df, tfidf FROM sc WHERE rk <= 5
    """,
)
def tfidf_top_terms(sf_dir: str):
    """Per-document top-5 TF-IDF salient terms (stages/tfidf.py):
    broadcast-df scoring, zero shuffles past the vocab build."""
    from doppel_ray.stages import tfidf

    ds = read_documents(sf_dir, columns=["doc_id", "text"])
    out = tfidf.tfidf_top_terms(ds, k=5)
    return finalize(
        out,
        pa.schema(
            [
                ("doc_id", pa.int64()),
                ("token", pa.string()),
                ("tf", pa.int64()),
                ("df", pa.int64()),
                ("tfidf", pa.float64()),
            ]
        ),
    )


@query(
    "mixture_fill",
    # Token-budget mixture construction: per-source doc selection in
    # stable md5 hash order until the source's token budget fills —
    # reproduced verbatim by a windowed cumulative sum over the same
    # md5_number_upper hash the samplers use. All-integer decisions, so
    # the value-hash comparison is exact.
    rf"""
    WITH n AS (
      SELECT doc_id, source,
             length(regexp_extract_all(text, '{A.WS_TOKEN_RE}'))::BIGINT
               AS n_tokens,
             md5_number_upper(CAST(doc_id AS VARCHAR)) AS h
      FROM documents
    ),
    c AS (
      SELECT doc_id, source, n_tokens,
             (sum(n_tokens) OVER (
                PARTITION BY source ORDER BY h, doc_id))::BIGINT AS c
      FROM n
    )
    SELECT doc_id, source, n_tokens FROM c
    WHERE c <= CASE source WHEN 'src0' THEN 700
                           WHEN 'src1' THEN 700
                           WHEN 'src2' THEN 0
                           ELSE 400 END
    """,
)
def mixture_fill(sf_dir: str):
    """Per-source token-budget fill (stages/mixture.py): keep each
    source's docs in deterministic hash order while its running token
    total stays within budget — 700 tokens for src0/src1, zero for
    src2, 400 for everything else."""
    from doppel_ray.stages.mixture import token_budget_fill

    ds = read_documents(sf_dir, columns=["doc_id", "source", "text"])
    out = token_budget_fill(
        ds,
        "source",
        {"src0": 700, "src1": 700, "src2": 0},
        default_budget=400,
        coarse_bits=4,  # tiny test corpora: keep marginal buckets non-trivial
    )
    return finalize(
        out,
        pa.schema(
            [
                ("doc_id", pa.int64()),
                ("source", pa.string()),
                ("n_tokens", pa.int64()),
            ]
        ),
    )


@query(
    "frequent_tokens",
    rf"""
    WITH tok AS (
      SELECT unnest(regexp_extract_all(text, '{A.WS_TOKEN_RE}')) AS token
      FROM documents
    )
    SELECT token, count(*)::BIGINT AS est
    FROM tok GROUP BY token HAVING count(*) >= 20
    """,
)
def frequent_tokens(sf_dir: str):
    """Corpus heavy hitters via the distributed Misra-Gries summary
    (stages/heavyhitters.py): shuffle volume is capacity x blocks, not
    corpus tokens. At this capacity every block's distinct tokens fit,
    so the total decrement is zero and the summary is EXACT — the SQL
    GROUP BY/HAVING oracle pairs verbatim; the lossy regime's bounds
    are pinned in tests/test_heavyhitters.py."""
    from doppel_ray.stages.heavyhitters import frequent_tokens as mg

    ds = read_documents(sf_dir, columns=["text"])
    table, total_dec = mg(ds, capacity=1 << 17, min_count=20)
    if total_dec != 0:
        raise RuntimeError(
            f"frequent_tokens exact-regime assumption broke: "
            f"total_decrement={total_dec} (raise capacity)"
        )
    return table


@query("dsir_scores")  # rows-only: logweight is a float SUM of many
# terms and SQL SUM order is unspecified, so no hash-exact twin exists;
# brute-force + bit-exact layout-invariance pins live in tests/test_dsir.py
def dsir_scores(sf_dir: str):
    """DSIR importance weights (stages/dsir.py, Xie et al. 2023) for
    every document against a target distribution (here: the src0
    domain as the 'high-quality' corpus): hashed unigram+bigram bucket
    counts -> broadcast log-ratio vector -> one zero-shuffle scoring
    pass. Row count always equals the corpus, so the driver's
    rows-only check is non-vacuous."""
    from doppel_ray.stages import dsir as D

    raw = read_documents(sf_dir, columns=["doc_id", "source", "text"])
    target = raw.filter(expr="source == 'src0'").select_columns(
        ["doc_id", "text"]
    )
    out = D.dsir_scores(
        raw.select_columns(["doc_id", "text"]), target, m=4096
    )
    return finalize(
        out,
        pa.schema(
            [
                ("doc_id", pa.int64()),
                ("n_ngrams", pa.int64()),
                ("logweight", pa.float64()),
            ]
        ),
    )


@query(
    "phrase_search",
    # Corpus phrase search: docs containing the literal phrase, with
    # non-overlapping occurrence counts — Arrow count_substring and the
    # SQL replace-length identity both scan left-to-right
    # non-overlapping, so the integer counts pair exactly.
    """
    SELECT doc_id,
           ((length(text) - length(replace(text, 'window window', '')))
             / length('window window'))::BIGINT AS n_hits
    FROM documents
    WHERE position('window window' IN text) > 0
    """,
)
def phrase_search(sf_dir: str):
    """Literal phrase search over the corpus (the grep primitive): one
    vectorized count_substring pass, rows with >= 1 hit. Zero shuffles;
    at 100 TB this is a pure streaming scan with column pruning."""
    ds = read_documents(sf_dir, columns=["doc_id", "text"])
    import pyarrow.compute as pc

    def fn(batch: pa.Table) -> pa.Table:
        n = pc.count_substring(
            pc.fill_null(batch["text"], ""), "window window"
        )
        t = pa.table(
            {"doc_id": batch["doc_id"], "n_hits": n.cast(pa.int64())}
        )
        return t.filter(pc.greater(t["n_hits"], 0))

    return finalize(
        ds.map_batches(fn, batch_format="pyarrow"),
        pa.schema([("doc_id", pa.int64()), ("n_hits", pa.int64())]),
    )


_DOMAIN_HOSTS = [
    "news.example.com",
    "blog.example.org",
    "shop.example.net",
    "wiki.example.io",
    "docs.example.dev",
]


@query(
    "domain_stats",
    # host extracted GENERICALLY in SQL (same rule as functions/urls.py
    # _HOST_RE), over per-doc URLs derived identically on both sides
    rf"""
    WITH aug AS (
      SELECT n_chars,
        'https://' || CASE doc_id % 5
          WHEN 0 THEN '{_DOMAIN_HOSTS[0]}'
          WHEN 1 THEN '{_DOMAIN_HOSTS[1]}'
          WHEN 2 THEN '{_DOMAIN_HOSTS[2]}'
          WHEN 3 THEN '{_DOMAIN_HOSTS[3]}'
          ELSE '{_DOMAIN_HOSTS[4]}'
        END || CASE WHEN doc_id % 10 < 5 THEN ':8443' ELSE '' END
        || '/art/' || CAST(doc_id AS VARCHAR) AS u
      FROM documents
    ),
    h AS (
      SELECT lower(regexp_extract(u,
               '^[A-Za-z][A-Za-z0-9+.-]*://([^/?#:]*)', 1)) AS domain,
             n_chars
      FROM aug
    )
    SELECT domain, count(*)::BIGINT AS n_docs,
           sum(n_chars)::BIGINT AS total_chars,
           min(n_chars)::BIGINT AS min_chars,
           max(n_chars)::BIGINT AS max_chars
    FROM h GROUP BY domain
    """,
)
def domain_stats(sf_dir: str):
    """Per-domain corpus rollup (the stats a domain-level quality /
    blocklist pass consumes): doc count and char-volume aggregates keyed
    on the host extracted by functions/urls.py extract_hosts. One
    map_batches + a narrow 5-key groupby — payload text never read.
    Ports must NOT split domains (half the synthetic URLs carry one)."""
    from ray.data.aggregate import Max, Min, Sum

    from doppel_ray.functions import urls as U

    ds = read_documents(sf_dir, columns=["doc_id", "n_chars"])

    def fn(batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_pandas()
        host = np.asarray(_DOMAIN_HOSTS, dtype=object)[(ids % 5).to_numpy()]
        port = np.where((ids % 10).to_numpy() < 5, ":8443", "")
        raw = "https://" + host + port + "/art/" + ids.astype(str)
        return pa.table(
            {
                "domain": U.extract_hosts(pa.array(raw, type=pa.string())),
                "n_chars": batch["n_chars"],
            }
        )

    g = (
        ds.map_batches(fn, batch_format="pyarrow")
        .groupby("domain")
        .aggregate(
            Count(alias_name="n_docs"),
            Sum("n_chars", alias_name="total_chars"),
            Min("n_chars", alias_name="min_chars"),
            Max("n_chars", alias_name="max_chars"),
        )
    )
    return finalize(
        g,
        pa.schema(
            [
                ("domain", pa.string()),
                ("n_docs", pa.int64()),
                ("total_chars", pa.int64()),
                ("min_chars", pa.int64()),
                ("max_chars", pa.int64()),
            ]
        ),
    )


# C4 cleaning needs multi-line pages with punctuation; the synthetic
# docs are single-line and unpunctuated, so (as with pii_masked /
# boilerplate_lines) both sides derive the same 4-line page from doc_id,
# exercising every rule: short line, no-terminal-punct line, javascript
# line, lorem-ipsum page, brace page, too-few-kept-lines page.
from doppel_ray.stages import c4clean as C4  # noqa: E402

_C4_LINE1 = "Leading sentence for document "
_C4_LINE1_TAIL = " with plenty of words."
_C4_L2 = [
    "short one.",
    "a line without any terminal punctuation mark here",
    "Please enable JavaScript to continue reading this page.",
    "A second well formed sentence appears right here.",
]
_C4_L3_HIT = "Third supporting sentence keeps this page in the corpus."
_C4_L3_MISS = "also missing punctuation so it goes away"
_C4_L4 = [
    "Lorem ipsum dolor sit amet.",
    "An object { literal } hides in this line.",
    "Closing sentence ends with a question mark?",
]


@query(
    "c4_clean_docs",
    rf"""
    WITH aug AS (
      SELECT doc_id,
        '{_C4_LINE1}' || CAST(doc_id AS VARCHAR) || '{_C4_LINE1_TAIL}'
        || chr(10) ||
        CASE doc_id % 4
          WHEN 0 THEN '{_C4_L2[0]}'
          WHEN 1 THEN '{_C4_L2[1]}'
          WHEN 2 THEN '{_C4_L2[2]}'
          ELSE '{_C4_L2[3]}'
        END || chr(10) ||
        CASE WHEN doc_id % 3 = 0 THEN '{_C4_L3_HIT}'
             ELSE '{_C4_L3_MISS}' END || chr(10) ||
        CASE doc_id % 13
          WHEN 0 THEN '{_C4_L4[0]}'
          WHEN 1 THEN '{_C4_L4[1]}'
          ELSE '{_C4_L4[2]}'
        END AS t
      FROM documents
    ),
    ls AS (SELECT doc_id, t, string_split(t, chr(10)) AS ls FROM aug),
    lines AS (
      SELECT doc_id, i AS pos, ls[i] AS line
      FROM ls, UNNEST(generate_series(1, len(ls))) AS u(i)
    ),
    flags AS (
      SELECT doc_id, pos, line,
        regexp_matches(line, '{C4.TERMINAL_RE}')
          AND length(regexp_extract_all(line, '{C4.WORD_RE}')) >= 5
          AND NOT regexp_matches(line, '{C4.JAVASCRIPT_RE}') AS keep
      FROM lines
    ),
    per_doc AS (
      SELECT doc_id,
        coalesce(string_agg(CASE WHEN keep THEN line END,
                            chr(10) ORDER BY pos), '') AS text_clean,
        sum(CASE WHEN keep THEN 1 ELSE 0 END)::BIGINT AS n_kept,
        sum(CASE WHEN keep THEN 0 ELSE 1 END)::BIGINT AS n_dropped
      FROM flags GROUP BY doc_id
    ),
    reasons AS (
      SELECT p.doc_id, p.text_clean, p.n_kept, p.n_dropped,
        CASE
          WHEN regexp_matches(a.t, '{C4.LOREM_RE}') THEN '{C4.REASON_LOREM}'
          WHEN strpos(a.t, chr(123)) > 0 THEN '{C4.REASON_BRACE}'
          WHEN p.n_kept < 3 THEN '{C4.REASON_FEW}'
          ELSE '' END AS drop_reason
      FROM per_doc p JOIN aug a USING (doc_id)
    )
    SELECT doc_id, text_clean, n_kept, n_dropped,
           drop_reason = '' AS kept, drop_reason
    FROM reasons
    """,
)
def c4_clean_docs(sf_dir: str):
    """C4-style cleaning (stages/c4clean.py): line filter (terminal
    punctuation + >= 5 words + no "javascript"), page drops (lorem
    ipsum / brace / < 3 surviving lines), cleaned text and counts.
    One map_batches pass, RE2 kernels shared verbatim with the SQL,
    no shuffle."""
    ds = read_documents(sf_dir, columns=["doc_id", "text"])

    def augment(batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_pandas()
        m4, m3, m13 = (
            (ids % 4).to_numpy(),
            (ids % 3).to_numpy(),
            (ids % 13).to_numpy(),
        )
        l2 = np.select(
            [m4 == 0, m4 == 1, m4 == 2],
            [_C4_L2[0], _C4_L2[1], _C4_L2[2]],
            default=_C4_L2[3],
        )
        l3 = np.where(m3 == 0, _C4_L3_HIT, _C4_L3_MISS)
        l4 = np.select(
            [m13 == 0, m13 == 1], [_C4_L4[0], _C4_L4[1]], default=_C4_L4[2]
        )
        t = (
            _C4_LINE1
            + ids.astype(str)
            + _C4_LINE1_TAIL
            + "\n"
            + l2
            + "\n"
            + l3
            + "\n"
            + l4
        )
        return pa.table(
            {"doc_id": batch["doc_id"], "text": pa.array(t, type=pa.string())}
        )

    out = C4.c4_clean(
        ds.map_batches(augment, batch_format="pyarrow")
    ).select_columns(
        ["doc_id", "text_clean", "n_kept", "n_dropped", "kept", "drop_reason"]
    )
    return finalize(
        out,
        pa.schema(
            [
                ("doc_id", pa.int64()),
                ("text_clean", pa.string()),
                ("n_kept", pa.int64()),
                ("n_dropped", pa.int64()),
                ("kept", pa.bool_()),
                ("drop_reason", pa.string()),
            ]
        ),
    )


_PCT_P = 0.9


@query(
    "token_len_percentile_filter",
    rf"""
    WITH f AS (
      SELECT doc_id,
             length(text)::BIGINT AS n_chars,
             length(regexp_extract_all(text, '{A.WS_TOKEN_RE}'))::BIGINT AS n_tokens
      FROM documents
    ),
    s AS (
      SELECT doc_id,
             CASE WHEN n_tokens > 0
                  THEN (n_chars - greatest(n_tokens - 1, 0)) / greatest(n_tokens, 1)
                  ELSE 0.0 END AS mean_token_len
      FROM f
    )
    SELECT doc_id, mean_token_len FROM s
    WHERE mean_token_len <= (SELECT quantile_disc(mean_token_len, {_PCT_P}) FROM s)
    """,
)
def token_len_percentile_filter(sf_dir: str):
    """Drop the long-token tail: keep documents whose mean token length
    is at or below the corpus's 90th percentile — the percentile-cutoff
    curation shape (CCNet-style) over a genuinely CONTINUOUS per-doc
    feature (mean_token_len is near-unique, unlike the heavily-tied
    composite quality score).

    The cutoff comes from ``exact_quantiles`` with ``driver_limit=64``,
    deliberately below the feature's cardinality so the distributed
    bucketed cumulative walk (the 100 TB regime for any float column —
    a near-unique score can never take the driver histogram) runs in the
    driver-visible surface, not just in tests. The walk returns the same
    element DuckDB's ``quantile_disc`` picks, and since the cutoff is an
    element of the column itself, the <= filter is exact on both engines
    (each ratio is one IEEE division of the same integers)."""
    from doppel_ray.stages.quantiles import exact_quantiles

    ds = read_documents(sf_dir, columns=["doc_id", "text"])
    scored = (
        textstats.add_quality_columns(ds)
        .select_columns(["doc_id", "mean_token_len"])
        # narrow (int64, float64) projection; materialized because the
        # quantile walk + the cutoff filter both consume it, and
        # recomputing the RE2 feature pass per consumer would triple the
        # scan. 16 B/row — object-store-bounded even at corpus scale.
        .materialize()
    )
    [(_, cutoff)] = exact_quantiles(
        scored, "mean_token_len", [_PCT_P], driver_limit=64
    )

    def keep(batch: pa.Table) -> pa.Table:
        return batch.filter(
            pa.compute.less_equal(batch["mean_token_len"], float(cutoff))
        )

    return finalize(
        scored.map_batches(keep, batch_format="pyarrow"),
        pa.schema([("doc_id", pa.int64()), ("mean_token_len", pa.float64())]),
    )


@query(
    "sources_per_lang",
    """
    SELECT lang,
           count(DISTINCT source) AS n_sources,
           count(*) AS n_docs
    FROM documents
    GROUP BY lang
    """,
)
def sources_per_lang(sf_dir: str):
    """Exact distinct-count per group: (lang, source) pairs dedupe with
    per-batch unique partials + cnt carries, ONE narrow two-key groupby
    (the exchange holds distinct pairs + counts, never documents), then
    a tiny per-lang rollup counts pairs and sums docs."""
    from ray.data.aggregate import Count, Sum

    ds = read_documents(sf_dir, columns=["lang", "source"])

    def partial(batch: pa.Table) -> pa.Table:
        # in-batch (lang, source) combine: one row per pair + its count
        g = batch.group_by(["lang", "source"]).aggregate([([], "count_all")])
        return g.rename_columns(["lang", "source", "cnt"])

    pairs = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby(["lang", "source"])
        .aggregate(Sum("cnt", alias_name="n"))
    )
    agg = pairs.groupby("lang").aggregate(
        Count(alias_name="n_sources"), Sum("n", alias_name="n_docs")
    )
    return finalize(
        agg,
        pa.schema(
            [("lang", pa.string()), ("n_sources", pa.int64()), ("n_docs", pa.int64())]
        ),
    )


#: pivot contract: the wide-column set is FIXED (like SQL PIVOT ... IN),
#: never discovered from data — a static schema is what lets the result
#: stream through typed Arrow batches.
_PIVOT_LANGS = ("de", "en", "es", "fr", "zh")


@query(
    "lang_source_pivot",
    """
    SELECT source,
           CAST(sum(CASE WHEN lang = 'de' THEN 1 ELSE 0 END) AS BIGINT) AS n_de,
           CAST(sum(CASE WHEN lang = 'en' THEN 1 ELSE 0 END) AS BIGINT) AS n_en,
           CAST(sum(CASE WHEN lang = 'es' THEN 1 ELSE 0 END) AS BIGINT) AS n_es,
           CAST(sum(CASE WHEN lang = 'fr' THEN 1 ELSE 0 END) AS BIGINT) AS n_fr,
           CAST(sum(CASE WHEN lang = 'zh' THEN 1 ELSE 0 END) AS BIGINT) AS n_zh,
           count(*) AS n_total
    FROM documents
    GROUP BY source
    """,
)
def lang_source_pivot(sf_dir: str):
    """PIVOT: source x lang count matrix as wide columns. The corpus
    reduces in ONE narrow (lang, source) count groupby; the reshape to
    wide runs on the bounded aggregate (|langs| x |sources| rows).
    Unlisted langs still count into n_total, matching the oracle."""
    agg = finalize(
        read_documents(sf_dir, columns=["lang", "source"])
        .groupby(["source", "lang"])
        .aggregate(Count(alias_name="n")),
        pa.schema(
            [("source", pa.string()), ("lang", pa.string()), ("n", pa.int64())]
        ),
    )
    df = agg.to_pandas()
    wide = df.pivot_table(
        index="source", columns="lang", values="n", aggfunc="sum", fill_value=0
    )
    sources = sorted(df["source"].unique())
    cols: dict[str, object] = {"source": pa.array(sources, type=pa.string())}
    for lang in _PIVOT_LANGS:
        vals = (
            wide[lang].reindex(sources).fillna(0).astype("int64").to_numpy()
            if lang in wide.columns
            else np.zeros(len(sources), dtype=np.int64)
        )
        cols[f"n_{lang}"] = pa.array(vals, type=pa.int64())
    totals = df.groupby("source")["n"].sum().reindex(sources).to_numpy()
    cols["n_total"] = pa.array(totals.astype("int64"), type=pa.int64())
    return pa.table(cols)


_SETOP_CTE = rf"""
    WITH t AS (
      SELECT lang,
             unnest(regexp_extract_all(lower(text), '{A.WS_TOKEN_RE}')) AS tok
      FROM documents WHERE lang IN ('en', 'de')
    ),
    d AS (SELECT DISTINCT tok, lang FROM t)
"""


def _en_de_tagged(sf_dir: str):
    """Tagged union of distinct-per-batch (token, side) pairs: en=1,
    de=2. Tokens explode batch-locally; the side bit rides along so the
    set-op shuffle carries narrow (token, uint8) rows only."""
    import pyarrow.compute as pc

    ds = read_documents(sf_dir, columns=["lang", "text"])

    def fn(batch: pa.Table) -> pa.Table:
        import pandas as pd

        keep = batch.filter(
            pc.is_in(batch["lang"], value_set=pa.array(["en", "de"]))
        )
        if keep.num_rows == 0:
            return pa.table(
                {
                    "v": pa.array([], type=pa.string()),
                    "side": pa.array([], type=pa.uint8()),
                }
            )
        s = pc.utf8_lower(keep["text"]).to_pandas()
        toks = s.str.findall(A.WS_TOKEN_RE)
        bits = np.where(
            keep["lang"].to_pandas().to_numpy() == "en", 1, 2
        ).astype(np.uint8)
        lens = toks.str.len().to_numpy()
        flat = toks.explode().dropna()
        return pa.table(
            {
                "v": pa.array(flat.to_numpy(), type=pa.string()),
                "side": pa.array(np.repeat(bits, lens), type=pa.uint8()),
            }
        )

    return ds.map_batches(fn, batch_format="pyarrow")


@query(
    "token_set_overlap",
    _SETOP_CTE
    + """
    , m AS (SELECT tok, count(*) AS sides FROM d GROUP BY tok)
    SELECT CAST((SELECT count(*) FROM d WHERE lang = 'en') AS BIGINT) AS n_a,
           CAST((SELECT count(*) FROM d WHERE lang = 'de') AS BIGINT) AS n_b,
           CAST((SELECT count(*) FROM m WHERE sides = 2) AS BIGINT) AS n_common,
           CAST((SELECT count(*) FROM m) AS BIGINT) AS n_union,
           CAST(floor(10000.0 * (SELECT count(*) FROM m WHERE sides = 2)
                      / (SELECT count(*) FROM m)) AS BIGINT) AS jaccard_bp
    """,
)
def token_set_overlap(sf_dir: str):
    """Vocabulary overlap between the en and de slices — the distinct-
    set cardinality primitive (stages/setops.py): batch-local distinct
    (token, side-bit) fold, ONE narrow bucketed shuffle, per-bucket OR
    + four counts, driver sums num_buckets rows. Jaccard reported in
    floored basis points so the oracle compare is integer-exact."""
    from doppel_ray.stages.setops import set_cardinalities

    c = set_cardinalities(_en_de_tagged(sf_dir))
    bp = (
        int(np.floor(10000.0 * c["n_common"] / c["n_union"]))
        if c["n_union"]
        else 0
    )
    return pa.table(
        {
            "n_a": pa.array([c["n_a"]], type=pa.int64()),
            "n_b": pa.array([c["n_b"]], type=pa.int64()),
            "n_common": pa.array([c["n_common"]], type=pa.int64()),
            "n_union": pa.array([c["n_union"]], type=pa.int64()),
            "jaccard_bp": pa.array([bp], type=pa.int64()),
        }
    )


@query(
    "shared_tokens",
    _SETOP_CTE
    + """
    SELECT tok FROM d WHERE lang = 'en'
    INTERSECT
    SELECT tok FROM d WHERE lang = 'de'
    """,
)
def shared_tokens(sf_dir: str):
    """SQL INTERSECT [DISTINCT]: tokens present in BOTH the en and de
    vocabularies (stages/setops.py set_op_rows mode='intersect') — each
    bucket emits its qualifying distinct values, streaming, exactly
    once."""
    from doppel_ray.stages.setops import set_op_rows

    out = set_op_rows(_en_de_tagged(sf_dir), "intersect").map_batches(
        lambda b: b.rename_columns(["tok"]), batch_format="pyarrow"
    )
    return finalize(out, pa.schema([("tok", pa.string())]))


@query("approx_sources_per_lang")  # rows-only: HLL estimate (no SQL
# analog); the result is DETERMINISTIC (md5 register folds, max-merge)
# and carries an in-query accuracy contract: the exact distinct rides
# along and the query RAISES past 5% relative error (p=12 sigma ~1.6%)
def approx_sources_per_lang(sf_dir: str):
    """Approximate COUNT(DISTINCT source) per lang via per-group
    HyperLogLog registers (stages/hashes.py grouped_approx_distinct) —
    the scale path when groups x values outgrows the exact distinct-pair
    shuffle. Shuffle volume is groups x blocks x 4 KiB, value-cardinality
    independent."""
    from doppel_ray.stages.hashes import grouped_approx_distinct

    ds = read_documents(sf_dir, columns=["lang", "source"])
    approx = {
        r["lang"]: r["approx_distinct"]
        for r in grouped_approx_distinct(ds, "lang", "source", p=12).take_all()
    }
    exact_rows = (
        ds.groupby(["lang", "source"])
        .count()
        .groupby("lang")
        .count()
        .take_all()
    )
    exact = {r["lang"]: r["count()"] for r in exact_rows}
    rows = []
    for lang in sorted(exact):
        a, e = int(approx.get(lang, 0)), int(exact[lang])
        err_bp = abs(a - e) * 10_000 // max(e, 1)
        if err_bp > 500:
            raise AssertionError(
                f"grouped HLL error {err_bp} bp for lang {lang!r} exceeds "
                "the 5% contract"
            )
        rows.append(
            {
                "lang": lang,
                "approx_distinct": a,
                "exact_distinct": e,
                "err_bp": int(err_bp),
            }
        )
    return pa.Table.from_pylist(
        rows,
        schema=pa.schema(
            [
                ("lang", pa.string()),
                ("approx_distinct", pa.int64()),
                ("exact_distinct", pa.int64()),
                ("err_bp", pa.int64()),
            ]
        ),
    )


@query(
    "ngram_diversity_by_source",
    # distinct-vs-total trigram ratio per source; the engine dedupes on
    # 64-bit gram hashes (the novelty.py collision stance — zero
    # collisions at any driver scale), the oracle on gram strings.
    # diversity_bp is integer floor division on both sides.
    r"""
    WITH toks AS (SELECT source,
                         regexp_extract_all(text, '[^\t\n\f\r ]+') AS tk
                  FROM documents),
    win AS (SELECT source, array_to_string(tk[i:i+2], ' ') AS g
            FROM toks, UNNEST(generate_series(1, len(tk) - 2)) AS u(i)),
    agg AS (SELECT source, count(DISTINCT g)::BIGINT AS n_distinct,
                   count(*)::BIGINT AS n_total
            FROM win GROUP BY source)
    SELECT source, n_distinct, n_total,
           (10000 * n_distinct) // n_total AS diversity_bp
    FROM agg
    """,
)
def ngram_diversity_by_source(sf_dir: str):
    """Per-source trigram diversity (type/token ratio in basis points)
    — the corpus audit that catches template farms and generator loops.
    stages/novelty.py ngram_diversity: in-batch distinct (source,
    gram-hash) fold, ONE narrow two-key groupby, tiny per-source
    rollup."""
    from doppel_ray.stages.novelty import ngram_diversity

    ds = read_documents(sf_dir, columns=["source", "text"])
    out = ngram_diversity(ds, n=3)
    return finalize(
        out,
        pa.schema(
            [
                ("source", pa.string()),
                ("n_distinct", pa.int64()),
                ("n_total", pa.int64()),
                ("diversity_bp", pa.int64()),
            ]
        ),
    )


@query(
    "length_outliers",
    # robust MAD outlier cut: both medians are quantile_disc elements
    # (the pinned discrete rule), deviations and the 2x threshold are
    # integer arithmetic — the flagged set is bit-identical. c=2 keeps
    # the cut non-vacuous on the tight synthetic length distribution
    # (12 outliers at sf0.01; c=3 flags none).
    """
    WITH med AS (SELECT quantile_disc(n_chars, 0.5) AS m FROM documents),
    dev AS (SELECT doc_id, n_chars,
                   abs(n_chars - med.m)::BIGINT AS abs_dev
            FROM documents, med),
    mad AS (SELECT quantile_disc(abs_dev, 0.5) AS d FROM dev)
    SELECT doc_id, n_chars, abs_dev
    FROM dev, mad WHERE abs_dev > 2 * mad.d
    """,
)
def length_outliers(sf_dir: str):
    """Robust quality cut: docs whose length deviates from the corpus
    median by more than 2 MADs (stages/quantiles.py mad_outliers — two
    distributed exact-quantile passes, one zero-shuffle filter;
    all-integer so layout-invariant and SQL-recomputable)."""
    from doppel_ray.stages.quantiles import mad_outliers

    ds = read_documents(sf_dir, columns=["doc_id", "n_chars"])
    out = mad_outliers(ds, "n_chars", c=2)
    return finalize(
        out,
        pa.schema(
            [
                ("doc_id", pa.int64()),
                ("n_chars", pa.int64()),
                ("abs_dev", pa.int64()),
            ]
        ),
    )


@query(
    "pmi_collocations",
    # top bigrams by LIFT (= exp(PMI)): joint from the bigram
    # distribution, marginals from unigrams. ln is not bit-stable
    # across engines, but lift is pure multiply/divide (correctly
    # rounded IEEE), so with the SAME association on both sides —
    # ((c*Nuni)*Nuni)/((Nbig*cx)*cy) — the doubles hash-match exactly.
    rf"""
    WITH tok AS (SELECT doc_id,
                        regexp_extract_all(lower(text), '{A.WS_TOKEN_RE}') AS ts
                 FROM documents),
    uni AS (SELECT t AS tok, count(*)::BIGINT AS c
            FROM tok, unnest(ts) AS u(t) GROUP BY 1),
    nuni AS (SELECT CAST(sum(c) AS DOUBLE) AS v FROM uni),
    pairs AS (SELECT ts[i] AS w1, ts[i+1] AS w2
              FROM tok, unnest(generate_series(1, len(ts) - 1)) AS u(i)),
    big AS (SELECT w1, w2, count(*)::BIGINT AS n FROM pairs GROUP BY 1, 2),
    nbig AS (SELECT CAST(sum(n) AS DOUBLE) AS v FROM big),
    scored AS (
      SELECT b.w1 || ' ' || b.w2 AS bigram, b.n,
             ((CAST(b.n AS DOUBLE) * nuni.v) * nuni.v) /
             ((nbig.v * CAST(ux.c AS DOUBLE)) * CAST(uy.c AS DOUBLE)) AS lift
      FROM big b
      CROSS JOIN nuni
      CROSS JOIN nbig
      JOIN uni ux ON ux.tok = b.w1
      JOIN uni uy ON uy.tok = b.w2
      WHERE b.n >= 10
    )
    SELECT bigram, n, lift FROM scored
    ORDER BY lift DESC, bigram LIMIT 20
    """,
)
def pmi_collocations(sf_dir: str):
    """Collocation mining: top-20 bigrams by lift above a support floor
    (stages/collocations.py) — combiner-first bigram + unigram
    relations, vocabulary-bounded broadcast lookup, one zero-shuffle
    scoring map, block-pruned global top-k. PMI = ln(lift) derives
    downstream; lift itself stays bit-exact across engines."""
    from doppel_ray.stages.collocations import bigram_lift_topk

    ds = read_documents(sf_dir, columns=["text"])
    out = bigram_lift_topk(ds, k=20, min_count=10)
    return finalize(
        out,
        pa.schema(
            [
                ("bigram", pa.string()),
                ("n", pa.int64()),
                ("lift", pa.float64()),
            ]
        ),
    )


_BIGRAM_MIN = 20


@query(
    "bigram_counts",
    rf"""
    WITH tok AS (SELECT doc_id,
                        regexp_extract_all(lower(text), '{A.WS_TOKEN_RE}') AS ts
                 FROM documents),
    pairs AS (SELECT ts[i] || ' ' || ts[i+1] AS bigram
              FROM tok, unnest(generate_series(1, len(ts) - 1)) AS u(i))
    SELECT bigram, count(*) AS n
    FROM pairs GROUP BY bigram HAVING count(*) >= {_BIGRAM_MIN}
    """,
)
def bigram_counts(sf_dir: str):
    """Corpus bigram (collocation) counts above a support floor —
    the n-gram statistic behind PMI collocation mining. Bigrams are
    built vectorized from the flattened token stream (one numpy slice
    pair per batch; document boundaries masked so no bigram crosses
    docs), counted batch-locally first (combiner), then one narrow
    (bigram, partial-count) groupby sums — the shuffle carries distinct
    bigrams per batch, never the token stream."""
    import pandas as pd

    from ray.data.aggregate import Sum

    ds = read_documents(sf_dir, columns=["text"])

    def partial(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        s = pc.utf8_lower(batch["text"]).to_pandas()
        toks = s.str.findall(A.WS_TOKEN_RE)
        lens = toks.str.len().to_numpy()
        flat = toks.explode().dropna().to_numpy()
        if len(flat) < 2:
            return pa.table(
                {
                    "bigram": pa.array([], type=pa.string()),
                    "pn": pa.array([], type=pa.int64()),
                }
            )
        # doc-boundary mask: position i starts a bigram unless it is the
        # last token of its document
        ends = np.cumsum(lens[lens > 0]) - 1  # last-token index per doc
        keep = np.ones(len(flat) - 1, dtype=bool)
        keep[ends[ends < len(flat) - 1]] = False
        left = flat[:-1][keep]
        right = flat[1:][keep]
        bg = pd.Series(left) + " " + pd.Series(right)
        vc = bg.value_counts()
        return pa.table(
            {
                "bigram": pa.array(vc.index.to_numpy(), type=pa.string()),
                "pn": pa.array(vc.to_numpy().astype(np.int64), type=pa.int64()),
            }
        )

    agg = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("bigram")
        .aggregate(Sum("pn", alias_name="n"))
        .map_batches(
            lambda b: b.filter(
                pa.compute.greater_equal(b["n"], _BIGRAM_MIN)
            ).select(["bigram", "n"]),
            batch_format="pyarrow",
        )
    )
    return finalize(agg, pa.schema([("bigram", pa.string()), ("n", pa.int64())]))


@query(
    "chars_quartile_counts",
    """
    WITH q AS (SELECT quantile_disc(n_chars, 0.25) AS q1,
                      quantile_disc(n_chars, 0.5)  AS q2,
                      quantile_disc(n_chars, 0.75) AS q3
               FROM documents)
    SELECT lang,
           CAST(CASE WHEN n_chars <= q1 THEN 1
                     WHEN n_chars <= q2 THEN 2
                     WHEN n_chars <= q3 THEN 3
                     ELSE 4 END AS BIGINT) AS quartile,
           count(*) AS n
    FROM documents, q
    GROUP BY 1, 2
    """,
)
def chars_quartile_counts(sf_dir: str):
    """Global quantile-bucket assignment (value-based NTILE): corpus
    quartile cutoffs come from the distributed exact-quantile shuffle
    (stages/quantiles.py — the HLL-gated scale path), then a ZERO-shuffle
    vectorized searchsorted assigns every row its quartile and one
    narrow (lang, quartile) groupby counts. Value-based buckets (<=
    cutoff), not positional NTILE, so ties are deterministic on both
    engines."""
    from ray.data.aggregate import Count

    from doppel_ray.stages.quantiles import exact_quantiles

    ds = read_documents(sf_dir, columns=["lang", "n_chars"])
    cuts = np.array(
        [v for _, v in exact_quantiles(ds, "n_chars", [0.25, 0.5, 0.75])],
        dtype=np.int64,
    )

    def assign(batch: pa.Table) -> pa.Table:
        v = batch["n_chars"].to_numpy(zero_copy_only=False)
        qt = (np.searchsorted(cuts, v, side="left") + 1).astype(np.int64)
        return pa.table(
            {"lang": batch["lang"], "quartile": pa.array(qt, type=pa.int64())}
        )

    agg = (
        ds.map_batches(assign, batch_format="pyarrow")
        .groupby(["lang", "quartile"])
        .aggregate(Count(alias_name="n"))
    )
    return finalize(
        agg,
        pa.schema(
            [("lang", pa.string()), ("quartile", pa.int64()), ("n", pa.int64())]
        ),
    )


@query(
    "lang_share",
    """
    SELECT lang, count(*) AS n,
           CAST(floor(10000.0 * count(*)
                      / (SELECT count(*) FROM documents)) AS BIGINT)
             AS share_bp
    FROM documents GROUP BY lang
    """,
)
def lang_share(sf_dir: str):
    """Ratio-to-total (percent-of-report window): one narrow lang count
    groupby; the share divides on the BOUNDED aggregate in floored basis
    points (identical double division both engines, then floor -> exact
    integer compare)."""
    from ray.data.aggregate import Count

    agg = finalize(
        read_documents(sf_dir, columns=["lang"])
        .groupby("lang")
        .aggregate(Count(alias_name="n")),
        pa.schema([("lang", pa.string()), ("n", pa.int64())]),
    )
    n = agg["n"].to_numpy()
    total = int(n.sum())
    bp = np.floor(10000.0 * n / total).astype(np.int64) if total else n * 0
    return pa.table(
        {
            "lang": agg["lang"],
            "n": agg["n"],
            "share_bp": pa.array(bp, type=pa.int64()),
        }
    )


@query(
    "lang_token_quantiles",
    rf"""
    SELECT lang,
           CAST(quantile_disc(n_tokens, 0.5) AS BIGINT) AS p50,
           CAST(quantile_disc(n_tokens, 0.9) AS BIGINT) AS p90
    FROM (SELECT lang,
                 length(regexp_extract_all(text, '{A.WS_TOKEN_RE}')) AS n_tokens
          FROM documents)
    GROUP BY lang
    """,
)
def lang_token_quantiles(sf_dir: str):
    """Exact per-group quantiles (median + p90 token count per lang) via
    stages/quantiles.grouped_quantiles: per-batch (group, value) count
    partials, ONE narrow groupby over distinct pairs, vectorized
    cumulative walk per bucket — the grouped twin of token_quantiles
    with no driver histogram at any group cardinality."""
    from doppel_ray.stages.quantiles import grouped_quantiles

    ds = read_documents(sf_dir, columns=["lang", "text"])

    def fn(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "lang": batch["lang"],
                "n_tokens": pa.array(
                    A.token_counts(batch["text"], A.WS_TOKEN_RE)
                ),
            }
        )

    counts = ds.map_batches(fn, batch_format="pyarrow")
    out = grouped_quantiles(counts, "lang", "n_tokens", [0.5, 0.9], ["p50", "p90"])
    return finalize(
        out,
        pa.schema(
            [("lang", pa.string()), ("p50", pa.int64()), ("p90", pa.int64())]
        ),
    )


@query(
    "longest_docs",
    """
    SELECT doc_id, n_chars FROM documents
    ORDER BY n_chars DESC, doc_id LIMIT 20
    """,
)
def longest_docs(sf_dir: str):
    """Global ORDER BY ... LIMIT without a full sort
    (stages/rank.global_topk): per-block top-k prune -> bounded
    survivor union -> final prune. Shuffle volume is k x blocks rows,
    corpus-size independent; doc_id breaks n_chars ties so the row set
    is total-order deterministic."""
    from doppel_ray.stages.rank import global_topk

    ds = read_documents(sf_dir, columns=["doc_id", "n_chars"])
    out = global_topk(
        ds, ["n_chars", "doc_id"], ascending=[False, True], k=20
    )
    return finalize(
        out, pa.schema([("doc_id", pa.int64()), ("n_chars", pa.int64())])
    )


#: approx_token_quantiles accuracy contract: the sketch's achieved rank
#: may deviate from the target p by at most this much (k=4096 gives
#: ~0.008 rank std at the median; 0.05 is >5 sigma)
_SKETCH_RANK_TOL = 0.05


@query("approx_token_quantiles")  # rows-only: approximate by design
def approx_token_quantiles(sf_dir: str):
    """Approximate token-count quantiles via the mergeable bottom-k row
    sample (functions/sketch.BottomKSample, k=4096): per-block <= k-row
    partials, driver concat+re-prune merge, ZERO shuffles — the sketch
    twin of token_quantiles for columns/scales where even the narrow
    histogram exchange is unwanted. Driver-visible accuracy contract
    (the ivf_topk pattern): a second zero-shuffle pass counts values <=
    each estimate, the achieved rank ships in the result as
    rank_error_bp, and the query RAISES if any error exceeds 5% rank.
    """
    from ray.data.aggregate import Count, Sum

    from doppel_ray.stages.hashes import approx_quantiles

    ds = read_documents(sf_dir, columns=["doc_id", "text"])

    def fn(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "doc_id": batch["doc_id"],
                "n_tokens": pa.array(
                    A.token_counts(batch["text"], A.WS_TOKEN_RE)
                ),
            }
        )

    counts = ds.map_batches(fn, batch_format="pyarrow").materialize()
    ps = [0.5, 0.9, 0.99]
    est = approx_quantiles(counts, "n_tokens", "doc_id", ps)
    cuts = [v for _, v in est]

    def rank_partial(batch: pa.Table) -> pa.Table:
        v = batch["n_tokens"].to_numpy(zero_copy_only=False)
        cols = {"n": pa.array([len(v)], type=pa.int64())}
        for i, c in enumerate(cuts):
            cols[f"le{i}"] = pa.array(
                [int((v <= c).sum())], type=pa.int64()
            )
        return pa.table(cols)

    tot = {"n": 0, **{f"le{i}": 0 for i in range(len(cuts))}}
    for b in counts.map_batches(
        rank_partial, batch_format="pyarrow", batch_size=None
    ).iter_batches(batch_format="pyarrow", batch_size=None):
        for k in tot:
            tot[k] += sum(b[k].to_pylist())

    rows = []
    for i, (p, v) in enumerate(est):
        achieved = tot[f"le{i}"] / tot["n"] if tot["n"] else 0.0
        err = abs(achieved - p)
        if err > _SKETCH_RANK_TOL:
            raise AssertionError(
                f"approx_token_quantiles: rank error {err:.4f} at p={p} "
                f"exceeds the {_SKETCH_RANK_TOL} contract"
            )
        rows.append(
            {
                "p_bp": int(round(p * 10_000)),
                "estimate": int(v),
                "rank_error_bp": int(round(err * 10_000)),
            }
        )
    return pa.Table.from_pylist(
        rows,
        schema=pa.schema(
            [
                ("p_bp", pa.int64()),
                ("estimate", pa.int64()),
                ("rank_error_bp", pa.int64()),
            ]
        ),
    )


@query(
    "dup_token_window_groups",
    # duplicated 8-token windows over pages derived identically on both
    # sides from doc_id: an 8-token intro shared corpus-wide, an 8-token
    # tail shared within each doc_id % 5 family, plus whatever organic
    # repeats the corpus carries. DuckDB list slicing is 1-based
    # inclusive: tk[i:i+7] is the 8-token window at i.
    r"""
    WITH aug AS (
      SELECT doc_id,
             'C1 C2 C3 C4 C5 C6 C7 C8 ' || text || ' T' ||
             CAST(doc_id % 5 AS VARCHAR) || ' Z1 Z2 Z3 Z4 Z5 Z6 Z7' AS t
      FROM documents
    ),
    toks AS (SELECT doc_id,
                    regexp_extract_all(t, '[^\t\n\f\r ]+') AS tk
             FROM aug),
    win AS (
      SELECT doc_id, i - 1 AS pos, array_to_string(tk[i:i+7], ' ') AS w
      FROM toks, UNNEST(generate_series(1, len(tk) - 7)) AS u(i)
    ),
    g AS (
      SELECT w, count(*)::BIGINT AS cnt,
             min(lpad(CAST(doc_id AS VARCHAR), 19, '0') || ':' ||
                 lpad(CAST(pos AS VARCHAR), 7, '0')) AS fk
      FROM win GROUP BY w HAVING count(*) > 1
    )
    SELECT w AS win_text, cnt,
           CAST(split_part(fk, ':', 1) AS BIGINT) AS first_doc,
           CAST(split_part(fk, ':', 2) AS BIGINT) AS first_pos
    FROM g
    """,
)
def dup_token_window_groups(sf_dir: str):
    """Substring-level dedup detection (Lee et al. 2022 granularity):
    every 8-token window repeated anywhere in the corpus, via
    stages/tokenwindows.py — rolling-hash prefilter groupby, broadcast
    hash-hit semi-join, string-verify groupby. Only duplicated windows
    ever ship as strings."""
    from doppel_ray.stages.tokenwindows import dup_token_windows

    ds = read_documents(sf_dir, columns=["doc_id", "text"])

    def augment(batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_pandas()
        t = (
            "C1 C2 C3 C4 C5 C6 C7 C8 "
            + batch["text"].to_pandas()
            + " T"
            + (ids % 5).astype(str)
            + " Z1 Z2 Z3 Z4 Z5 Z6 Z7"
        )
        return pa.table(
            {"doc_id": batch["doc_id"], "text": pa.array(t, type=pa.string())}
        )

    out = dup_token_windows(
        ds.map_batches(augment, batch_format="pyarrow"), window=8
    )
    return finalize(
        out,
        pa.schema(
            [
                ("win_text", pa.string()),
                ("cnt", pa.int64()),
                ("first_doc", pa.int64()),
                ("first_pos", pa.int64()),
            ]
        ),
    )


@query(
    "span_removed_docs",
    # duplicated-span REMOVAL over the same augmented corpus as
    # dup_token_window_groups: each duplicated 8-token window keeps its
    # min-(doc,pos) occurrence; every other occurrence's tokens are
    # excised and the doc is rebuilt as the space-join of survivors
    # (whitespace-normalized, Lee et al. 2022 semantics). Non-vacuous by
    # construction: the corpus-wide intro window is removed from every
    # doc but the min doc_id, the per-family tail from all but each
    # family's first.
    r"""
    WITH aug AS (
      SELECT doc_id,
             'C1 C2 C3 C4 C5 C6 C7 C8 ' || text || ' T' ||
             CAST(doc_id % 5 AS VARCHAR) || ' Z1 Z2 Z3 Z4 Z5 Z6 Z7' AS t
      FROM documents
    ),
    toks AS (SELECT doc_id,
                    regexp_extract_all(t, '[^\t\n\f\r ]+') AS tk
             FROM aug),
    win AS (
      SELECT doc_id, i - 1 AS pos, array_to_string(tk[i:i+7], ' ') AS w
      FROM toks, UNNEST(generate_series(1, len(tk) - 7)) AS u(i)
    ),
    g AS (
      SELECT w,
             min(lpad(CAST(doc_id AS VARCHAR), 19, '0') || ':' ||
                 lpad(CAST(pos AS VARCHAR), 7, '0')) AS fk
      FROM win GROUP BY w HAVING count(*) > 1
    ),
    rem AS (
      SELECT win.doc_id, win.pos
      FROM win JOIN g ON win.w = g.w
      WHERE lpad(CAST(win.doc_id AS VARCHAR), 19, '0') || ':' ||
            lpad(CAST(win.pos AS VARCHAR), 7, '0') <> g.fk
    ),
    cov AS (
      SELECT DISTINCT doc_id, pos + k AS tpos
      FROM rem, UNNEST(generate_series(0, 7)) AS s(k)
    ),
    tokpos AS (
      SELECT doc_id, i - 1 AS tpos, tk[i] AS tok
      FROM toks, UNNEST(generate_series(1, len(tk))) AS u(i)
    )
    SELECT tp.doc_id,
           coalesce(string_agg(tp.tok, ' ' ORDER BY tp.tpos)
                      FILTER (WHERE cov.tpos IS NULL), '') AS text,
           count(*)::BIGINT AS n_tokens,
           count(cov.tpos)::BIGINT AS n_removed
    FROM tokpos tp
    LEFT JOIN cov ON tp.doc_id = cov.doc_id AND tp.tpos = cov.tpos
    GROUP BY tp.doc_id
    """,
)
def span_removed_docs(sf_dir: str):
    """Substring-level dedup REMOVAL (Lee et al. 2022): rewrite every
    doc with all non-first occurrences of duplicated 8-token windows
    excised, via stages/tokenwindows.remove_dup_spans — hash-prefilter
    candidate pass, ONE bucketed shuffle on the 128-bit (h1, h2) hash
    pair emitting narrow (doc, pos) removal pairs (string-free; joint
    collision ~2^-128 per pair, identical to the exact verify="string"
    path on any real corpus), broadcast-or-bucketed rebuild with the
    vectorized normalized passthrough for unaffected docs."""
    from doppel_ray.stages.tokenwindows import remove_dup_spans

    ds = read_documents(sf_dir, columns=["doc_id", "text"])

    def augment(batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_pandas()
        t = (
            "C1 C2 C3 C4 C5 C6 C7 C8 "
            + batch["text"].to_pandas()
            + " T"
            + (ids % 5).astype(str)
            + " Z1 Z2 Z3 Z4 Z5 Z6 Z7"
        )
        return pa.table(
            {"doc_id": batch["doc_id"], "text": pa.array(t, type=pa.string())}
        )

    out = remove_dup_spans(
        ds.map_batches(augment, batch_format="pyarrow"), window=8
    )
    return finalize(
        out,
        pa.schema(
            [
                ("doc_id", pa.int64()),
                ("text", pa.string()),
                ("n_tokens", pa.int64()),
                ("n_removed", pa.int64()),
            ]
        ),
    )


@query(
    "cms_token_estimates",
    # Count-Min point queries are EXACT integer arithmetic over a
    # deterministic md5 grid, so the whole sketch is SQL-recomputable:
    # the oracle rebuilds the identical depth-4 x width-16 grid (width
    # deliberately tiny vs the 31-token synthetic vocab so the
    # overestimate path is non-vacuous: 6 of 8 probes collide) and takes
    # the same min-over-rows. cms_est >= true_cnt by construction.
    r"""
    WITH toks AS (SELECT unnest(regexp_extract_all(text,
                         '[^\t\n\f\r ]+')) AS tok FROM documents),
    probes(token) AS (VALUES ('join'), ('hash'), ('batch'), ('vector'),
                             ('window'), ('spark'), ('the'), ('zzzunseen')),
    cells AS (
      SELECT j, CAST(md5_number_upper(tok || '#' ||
                     CAST(j AS VARCHAR)) % 16 AS BIGINT) AS slot,
             count(*)::BIGINT AS c
      FROM toks, UNNEST(generate_series(0, 3)) AS g(j)
      GROUP BY 1, 2
    ),
    est AS (
      SELECT p.token, min(coalesce(c.c, 0)) AS cms_est
      FROM probes p
      CROSS JOIN UNNEST(generate_series(0, 3)) AS g(j)
      LEFT JOIN cells c
        ON c.j = g.j
       AND c.slot = CAST(md5_number_upper(p.token || '#' ||
                         CAST(g.j AS VARCHAR)) % 16 AS BIGINT)
      GROUP BY p.token
    ),
    truth AS (SELECT tok AS token, count(*)::BIGINT AS true_cnt
              FROM toks GROUP BY tok)
    SELECT e.token, coalesce(t.true_cnt, 0) AS true_cnt, e.cms_est
    FROM est e LEFT JOIN truth t USING (token)
    """,
)
def cms_token_estimates(sf_dir: str):
    """Count-Min sketch point queries (stages/cms.py): per-block exact
    token counts scattered into the md5 grid, nonzero cells only through
    ONE narrow structure-bounded groupby, estimates = min over rows.
    Probes cover hot, mid, and absent tokens; true counts ride along
    from a probe-filtered exact pass."""
    from doppel_ray.stages.cms import cms_point_estimates

    ds = read_documents(sf_dir, columns=["text"])
    return cms_point_estimates(
        ds,
        ["join", "hash", "batch", "vector", "window", "spark", "the",
         "zzzunseen"],
        width=16,
        depth=4,
    )


def _profile_leg_sql(col: str) -> str:
    return f"""
    SELECT '{col}' AS col, count(*) AS n,
           count(*) - count({col}) AS n_null,
           count(DISTINCT {col}) AS n_distinct,
           coalesce(CAST(min({col}) AS VARCHAR), '') AS min_s,
           coalesce(CAST(max({col}) AS VARCHAR), '') AS max_s
    FROM documents"""


@query(
    "table_profile",
    " UNION ALL ".join(
        _profile_leg_sql(c) for c in ("doc_id", "lang", "source", "n_chars")
    ),
)
def table_profile(sf_dir: str):
    """Per-column data-quality profile of the documents table (count /
    nulls / exact distinct / min / max as canonical strings) — the
    schema audit run before trusting a corpus drop. Scale shape in
    stages/profile.py: constant-size fold per column plus one key-only
    distinct shuffle per column."""
    from doppel_ray.stages.profile import profile_table

    cols = ["doc_id", "lang", "source", "n_chars"]
    ds = read_documents(sf_dir, columns=cols)
    return profile_table(ds, cols)


@query("bpe_merges")  # rows-only: iterative argmax has no SQL analog;
# the merge sequence is pinned vs the canonical Sennrich reference loop
# and driver==distributed equivalence in tests/test_bpe.py
def bpe_merges(sf_dir: str):
    """Tokenizer training: first 24 BPE merges learned on the documents
    corpus (stages/bpe.py — ONE corpus-wide word-freq shuffle, then
    merge rounds on the bounded word-TYPE table; ties broken
    deterministically, so output is layout-invariant)."""
    from doppel_ray.stages import bpe

    ds = read_documents(sf_dir, columns=["text"])
    return bpe.learn_bpe(ds, 24)


@query("compression_signal")  # rows-only: DuckDB has no zlib-length SQL
# function; the exact lengths are cross-checked against direct
# zlib.compress on the same parquet in tests/test_lm_compress.py
def compression_signal(sf_dir: str):
    """Per-doc zlib compression signal (raw UTF-8 bytes vs compressed
    bytes) — the classic cheap spam/gibberish detector (repetitive spam
    compresses far below natural text, random junk barely at all).
    Integer columns only, so the result is bit-deterministic; pure map
    stage, zero shuffles (stages/textstats.py:add_compression_signal)."""
    ds = read_documents(sf_dir, columns=["doc_id", "text"])
    out = textstats.add_compression_signal(ds)
    return finalize(
        out.select_columns(["doc_id", "raw_len", "comp_len"]),
        pa.schema(
            [("doc_id", pa.int64()), ("raw_len", pa.int64()), ("comp_len", pa.int64())]
        ),
    )


@query("bpe_unit_counts")  # rows-only: greedy merge application has no
# SQL analog; pinned vs a brute-force per-word encoder and the
# train->encode round-trip invariant in tests/test_bpe.py
def bpe_unit_counts(sf_dir: str):
    """Tokenizer APPLY half: learn 32 BPE merges on the corpus, then
    encode every document and count its subword units (stages/bpe.py:
    BPEEncoder — merge ranks + Zipf-friendly word memo built once per
    actor; corpus passes: one word-freq shuffle + one map)."""
    from doppel_ray.stages import bpe

    ds = read_documents(sf_dir, columns=["doc_id", "text"])
    merges_tbl = bpe.learn_bpe(ds, 32)
    merges = [(r["left"], r["right"]) for r in merges_tbl.to_pylist()]
    out = bpe.encode_unit_counts(ds, merges)
    return finalize(
        out.select_columns(["doc_id", "n_bpe_units"]),
        pa.schema([("doc_id", pa.int64()), ("n_bpe_units", pa.int64())]),
    )


@query("lm_perplexity")  # rows-only: interpolated-bigram perplexity is
# not SQL-expressible with hash-stable floats; the model + scores are
# pinned vs a brute-force reference LM in tests/test_lm_compress.py
def lm_perplexity(sf_dir: str):
    """CCNet-style LM quality signal: train a bounded interpolated
    bigram LM on the corpus (top-V vocab + capped bigram table, both
    broadcast once), score every doc's perplexity (stages/lm.py —
    two narrow training shuffles, zero-shuffle scoring)."""
    from doppel_ray.stages import lm

    ds = read_documents(sf_dir, columns=["doc_id", "text"])
    model = lm.train_bigram_lm(ds, vocab_size=20_000, max_bigrams=500_000)
    return finalize(
        lm.perplexity_scores(ds, model),
        pa.schema(
            [("doc_id", pa.int64()), ("n_tokens", pa.int64()), ("ppl", pa.float64())]
        ),
    )


#: BM25 demo query: mixed document frequencies (at sf0.01 'dup' df=25,
#: 'hash'/'vector' df~390 of 500) exercise the idf range.
_BM25_TERMS = ["dup", "hash", "vector"]
_BM25_K = 25


def _bm25_sql() -> str:
    """Oracle mirroring stages/retrieval.py term-by-term: same RE2
    tokenizer, same integer stats, the same score expression tree with
    every float literal cast to DOUBLE (bare SQL literals are DECIMAL,
    whose arithmetic rounds differently from IEEE doubles). The emitted
    score is ``floor(score * 1e6)`` int64: DuckDB's ``ln`` and numpy's
    ``log`` differ by 1 ulp on ~30% of inputs (measured), so raw-double
    hash compare is impossible, while the fixed-point floor absorbs
    ulp noise and still pins 6 decimal digits of the score math."""
    tf_cols = ",\n             ".join(
        "length(list_filter(toks, t -> t = '{0}'))::BIGINT AS tf_{1}".format(w, i)
        for i, w in enumerate(_BM25_TERMS)
    )
    df_cols = ",\n             ".join(
        f"sum(CASE WHEN tf_{i} > 0 THEN 1 ELSE 0 END)::BIGINT AS df_{i}"
        for i in range(len(_BM25_TERMS))
    )
    terms = "\n           + ".join(
        f"ln(1.0::DOUBLE + (g.n - g.df_{i} + 0.5::DOUBLE) / (g.df_{i} + 0.5::DOUBLE))"
        f" * (f.tf_{i} * (1.2::DOUBLE + 1.0::DOUBLE))"
        f" / (f.tf_{i} + 1.2::DOUBLE * (1.0::DOUBLE - 0.75::DOUBLE"
        f" + 0.75::DOUBLE * (f.dl / (g.sum_dl / g.n))))"
        for i in range(len(_BM25_TERMS))
    )
    return f"""
    WITH tok AS (
      SELECT doc_id, regexp_extract_all(lower(text), '\\S+') AS toks
      FROM documents
    ),
    f AS (
      SELECT doc_id,
             length(toks)::BIGINT AS dl,
             {tf_cols}
      FROM tok
    ),
    g AS (
      SELECT count(*)::BIGINT AS n,
             sum(dl)::BIGINT AS sum_dl,
             {df_cols}
      FROM f
    ),
    s AS (
      SELECT f.doc_id,
             {terms} AS score
      FROM f CROSS JOIN g
    )
    SELECT doc_id, floor(score * 1000000.0::DOUBLE)::BIGINT AS score_u
    FROM s
    ORDER BY score DESC, doc_id
    LIMIT {_BM25_K}
    """


@query("bm25_topk", _bm25_sql())
def bm25_topk_query(sf_dir: str):
    """Okapi BM25 top-k keyword retrieval (stages/retrieval.py): two
    streaming passes (per-doc term stats -> one (m+2)-integer fold ->
    broadcast idf/avgdl scalars -> score map) + block-pruned global
    top-k; no full sort, no wide shuffle. Output score is floored
    micro-units so the compare is integer-exact (see _bm25_sql)."""
    import pyarrow.compute as pc_

    from doppel_ray.stages import retrieval

    ds = read_documents(sf_dir, columns=["doc_id", "text"])
    top = retrieval.bm25_topk(ds, _BM25_TERMS, k=_BM25_K)

    def to_micro(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "doc_id": batch["doc_id"],
                "score_u": pc_.cast(
                    pc_.floor(pc_.multiply(batch["score"], 1000000.0)),
                    pa.int64(),
                ),
            }
        )

    return finalize(
        top.map_batches(to_micro, batch_format="pyarrow"),
        pa.schema([("doc_id", pa.int64()), ("score_u", pa.int64())]),
    )


def _hybrid_sql() -> str:
    """RRF hybrid-retrieval oracle: each leg ranked by its micro-unit
    floored score (ties id ASC) exactly as stages/retrieval.py's
    determinism contract prescribes; from integer ranks onward the RRF
    arithmetic is two exact divisions + one add — bit-identical across
    engines. Embeddings cast to DOUBLE[] (list_cosine_similarity would
    otherwise accumulate in float32; measured 0 micro-unit mismatches
    at sf0.01 after the cast)."""
    bm25 = _bm25_sql()
    # reuse the BM25 CTE chain up to the per-doc score relation `s`
    body = bm25[: bm25.index("SELECT doc_id, floor(score")]
    return f"""{body}
    , sq AS (
      SELECT doc_id, floor(score * 1000000.0::DOUBLE)::BIGINT AS score_u
      FROM s
    ),
    sr AS (
      SELECT doc_id, row_number() OVER (ORDER BY score_u DESC, doc_id) AS r
      FROM sq ORDER BY score_u DESC, doc_id LIMIT 50
    ),
    cosq AS (
      SELECT x.vec_id AS doc_id,
             floor(list_cosine_similarity(
               x.embedding::DOUBLE[], q.embedding::DOUBLE[]
             ) * 1000000.0::DOUBLE)::BIGINT AS cos_u
      FROM embeddings x, (SELECT embedding FROM embeddings WHERE vec_id = 0) q
    ),
    cr AS (
      SELECT doc_id, row_number() OVER (ORDER BY cos_u DESC, doc_id) AS r
      FROM cosq ORDER BY cos_u DESC, doc_id LIMIT 50
    ),
    fused AS (
      SELECT COALESCE(sr.doc_id, cr.doc_id) AS doc_id,
             (CASE WHEN sr.r IS NOT NULL
                   THEN 1.0::DOUBLE / (60 + sr.r) ELSE 0.0::DOUBLE END)
           + (CASE WHEN cr.r IS NOT NULL
                   THEN 1.0::DOUBLE / (60 + cr.r) ELSE 0.0::DOUBLE END) AS rrf
      FROM sr FULL OUTER JOIN cr ON sr.doc_id = cr.doc_id
    )
    SELECT doc_id, floor(rrf * 1000000000.0::DOUBLE)::BIGINT AS rrf_u
    FROM fused ORDER BY rrf DESC, doc_id LIMIT 20
    """


@query("hybrid_topk", _hybrid_sql())
def hybrid_topk(sf_dir: str):
    """Hybrid retrieval: reciprocal-rank fusion of the BM25 sparse leg
    (_BM25_TERMS) and a dense cosine leg (query = doc 0's embedding) —
    the standard production search shape (stages/retrieval.py:
    hybrid_rrf_topk; both legs stream into block-pruned top-k, only
    two <= 50-row tables reach the driver)."""
    from doppel_ray.sources.parquet import read_embeddings
    from doppel_ray.stages import retrieval

    docs = read_documents(sf_dir, columns=["doc_id", "text"])
    embeds = read_embeddings(sf_dir, columns=["vec_id", "embedding"])
    qrow = embeds.filter(expr="vec_id == 0").take_all()
    qv = np.asarray(qrow[0]["embedding"], dtype=np.float64)
    return retrieval.hybrid_rrf_topk(
        docs, embeds, _BM25_TERMS, qv, k=20, leg_n=50, rrf_k=60
    )


@query(
    "novelty_scores",
    # exact gram-overlap oracle: DISTINCT token 3-grams per doc (n=3 so
    # the check is non-vacuous at sf0.01, mirroring contaminated_docs;
    # the shipping n=8 path is pinned in tests/test_novelty.py); index =
    # doc_id % 3 == 0. novelty is one BIGINT/BIGINT IEEE division.
    rf"""
    WITH toks AS (
      SELECT doc_id, regexp_extract_all(text, '{A.WS_TOKEN_RE}') AS tk
      FROM documents
    ),
    grams AS (
      SELECT DISTINCT doc_id, array_to_string(tk[i:i+2], ' ') AS g
      FROM toks, UNNEST(generate_series(1, greatest(len(tk)-2, 0))) AS u(i)
    ),
    idx AS (SELECT DISTINCT g FROM grams WHERE doc_id % 3 = 0),
    newg AS (SELECT doc_id, g FROM grams WHERE doc_id % 3 <> 0)
    SELECT newg.doc_id,
           count(*)::BIGINT AS n_grams,
           sum(CASE WHEN idx.g IS NOT NULL THEN 1 ELSE 0 END)::BIGINT AS n_hit,
           (count(*)::BIGINT
            - sum(CASE WHEN idx.g IS NOT NULL THEN 1 ELSE 0 END)::BIGINT)
           / count(*)::BIGINT AS novelty
    FROM newg LEFT JOIN idx ON newg.g = idx.g
    GROUP BY newg.doc_id
    ORDER BY newg.doc_id
    """,
)
def novelty_scores(sf_dir: str):
    """Crawl-batch novelty audit (stages/novelty.py): fraction of each
    new document's distinct token n-grams the index corpus (doc_id % 3
    == 0 plays the existing crawl) has never seen — ONE narrow gram-hash
    shuffle, no broadcast, no payload movement."""
    import pyarrow.compute as pc_

    from doppel_ray.stages import novelty

    ds = read_documents(sf_dir, columns=["doc_id", "text"])

    def side(is_index: bool):
        def fn(batch: pa.Table) -> pa.Table:
            ids = batch["doc_id"].to_numpy(zero_copy_only=False)
            m = (ids % 3) == 0
            return batch.filter(pa.array(m if is_index else ~m))

        return fn

    index_ds = ds.map_batches(side(True), batch_format="pyarrow")
    new_ds = ds.map_batches(side(False), batch_format="pyarrow")
    out = novelty.novelty_scores(new_ds, index_ds, n=3)
    return finalize(
        out,
        pa.schema(
            [
                ("doc_id", pa.int64()),
                ("n_grams", pa.int64()),
                ("n_hit", pa.int64()),
                ("novelty", pa.float64()),
            ]
        ),
    )


def _pagerank_sql(num_iters: int = 3) -> str:
    """Unrolled integer-PageRank oracle: every step is exact int64
    arithmetic (// is floor division on positive BIGINTs in both
    engines), so ranks compare hash-exactly at any summation order.
    The synthetic link graph gives every doc exactly 3 out-edges
    (dst = (id*31 + i*7) % N, i in 1..3 — multi-edges kept with
    multiplicity), so there are no dangling nodes and the node set is
    exactly the doc_id range."""
    parts = [
        """
    WITH nn AS (SELECT count(*)::BIGINT AS n FROM documents),
    edges AS (
      SELECT doc_id AS src,
             (doc_id * 31 + i * 7) % (SELECT n FROM nn) AS dst
      FROM documents, UNNEST(generate_series(1, 3)) AS t(i)
    ),
    outdeg AS (SELECT src, count(*)::BIGINT AS od FROM edges GROUP BY 1),
    it0 AS (SELECT doc_id AS node, 1000000::BIGINT AS r FROM documents)
    """
    ]
    for k in range(1, num_iters + 1):
        parts.append(
            f"""
    , s{k} AS (
      SELECT e.dst AS node, sum(p.r // o.od)::BIGINT AS c
      FROM edges e
      JOIN it{k - 1} p ON p.node = e.src
      JOIN outdeg o ON o.src = e.src
      GROUP BY 1
    ),
    it{k} AS (
      SELECT d.doc_id AS node,
             (150000 + (85 * COALESCE(s.c, 0)) // 100)::BIGINT AS r
      FROM documents d
      LEFT JOIN s{k} s ON s.node = d.doc_id
    )"""
        )
    parts.append(
        f"\n    SELECT node, r AS rank FROM it{num_iters} ORDER BY node"
    )
    return "".join(parts)


@query(
    "gopher_quality_flags",
    # Gopher A1.1 document rules, all-integer comparisons on both
    # engines (mean-word-length as 3n <= chars <= 10n). Non-vacuous at
    # sf0.01: the word-count window splits 277/500, the stopword floor
    # 224/500.
    r"""
    WITH w AS (
      SELECT doc_id,
             regexp_extract_all(text, '[^\t\n\f\r ]+') AS toks
      FROM documents
    ),
    f AS (
      SELECT doc_id,
             len(toks)::BIGINT AS n_words,
             coalesce((SELECT sum(length(t))
                       FROM unnest(toks) AS u(t)), 0)::BIGINT
               AS n_word_chars,
             (SELECT count(*) FROM unnest(toks) AS u(t)
                WHERE regexp_matches(t, '[A-Za-z]'))::BIGINT
               AS n_alpha_words,
             (SELECT count(*) FROM unnest(toks) AS u(t)
                WHERE t IN ('the','be','to','of','and','that','have',
                            'with'))::BIGINT AS n_stopwords
      FROM w
    )
    SELECT doc_id, n_words, n_word_chars, n_alpha_words, n_stopwords,
           (n_words BETWEEN 50 AND 100000
            AND n_word_chars >= 3 * n_words
            AND n_word_chars <= 10 * n_words
            AND 10 * n_alpha_words >= 8 * n_words
            AND n_stopwords >= 2) AS keep
    FROM f
    """,
)
def gopher_quality_flags(sf_dir: str):
    """The canonical Gopher document-quality rule set (Rae et al. 2021
    A1.1; stages/textstats.py gopher_quality_flags): word-count and
    mean-word-length windows, alphabetic-word fraction, stopword floor
    — per-rule audit counts plus the combined keep flag, one vectorized
    zero-shuffle pass."""
    from doppel_ray.stages.textstats import gopher_quality_flags as G

    ds = read_documents(sf_dir, columns=["doc_id", "text"])
    return finalize(
        G(ds),
        pa.schema(
            [
                ("doc_id", pa.int64()),
                ("n_words", pa.int64()),
                ("n_word_chars", pa.int64()),
                ("n_alpha_words", pa.int64()),
                ("n_stopwords", pa.int64()),
                ("keep", pa.bool_()),
            ]
        ),
    )


@query(
    "doc_bin_packing",
    # next-fit-decreasing inside md5 hash buckets: the recursive CTE
    # walks each bucket's (len DESC, doc_id) order exactly as the
    # engine's per-bucket pass does — both all-integer, hash-exact.
    """
    WITH RECURSIVE lens AS (
      SELECT doc_id, n_chars AS len,
             CAST(md5_number_upper(CAST(doc_id AS VARCHAR)) % 8
                  AS BIGINT) AS bucket
      FROM documents
    ),
    ordered AS (
      SELECT doc_id, len, bucket,
             row_number() OVER (
               PARTITION BY bucket ORDER BY len DESC, doc_id
             ) AS rn
      FROM lens
    ),
    packed AS (
      SELECT doc_id, len, bucket, rn, 0::BIGINT AS bin, len AS fill
      FROM ordered WHERE rn = 1
      UNION ALL
      SELECT o.doc_id, o.len, o.bucket, o.rn,
             CASE WHEN p.fill + o.len > 2000 THEN p.bin + 1
                  ELSE p.bin END,
             CASE WHEN p.fill + o.len > 2000 THEN o.len
                  ELSE p.fill + o.len END
      FROM ordered o JOIN packed p
        ON o.bucket = p.bucket AND o.rn = p.rn + 1
    )
    SELECT doc_id, bucket, bin FROM packed
    """,
)
def doc_bin_packing(sf_dir: str):
    """Doc-integral training-batch packing: whole documents into
    2000-char bins via next-fit-decreasing inside 8 md5 hash buckets
    (stages/packing.py pack_bins_nfd — ONE bucketed shuffle of the
    narrow (id, len) relation; the order-dependent walk is the
    per-bucket unit of parallelism)."""
    from doppel_ray.stages.packing import pack_bins_nfd

    ds = read_documents(sf_dir, columns=["doc_id", "n_chars"])
    out = pack_bins_nfd(ds, 2000, len_col="n_chars", num_buckets=8)
    return finalize(
        out,
        pa.schema(
            [("doc_id", pa.int64()), ("bucket", pa.int64()), ("bin", pa.int64())]
        ),
    )


def _trustrank_sql(num_iters: int = 3) -> str:
    """Unrolled integer-TRUSTRANK oracle (Gyongyi et al. 2004): same
    graph and integer arithmetic as `_pagerank_sql`, but the teleport
    mass lands only on the seed whitelist (doc_id % 50 = 0): initial
    rank = scale on seeds / 0 elsewhere, per-iteration base term only
    on seeds."""
    parts = [
        """
    WITH nn AS (SELECT count(*)::BIGINT AS n FROM documents),
    edges AS (
      SELECT doc_id AS src,
             (doc_id * 31 + i * 7) % (SELECT n FROM nn) AS dst
      FROM documents, UNNEST(generate_series(1, 3)) AS t(i)
    ),
    outdeg AS (SELECT src, count(*)::BIGINT AS od FROM edges GROUP BY 1),
    it0 AS (SELECT doc_id AS node,
                   (CASE WHEN doc_id % 50 = 0 THEN 1000000
                         ELSE 0 END)::BIGINT AS r
            FROM documents)
    """
    ]
    for k in range(1, num_iters + 1):
        parts.append(
            f"""
    , s{k} AS (
      SELECT e.dst AS node, sum(p.r // o.od)::BIGINT AS c
      FROM edges e
      JOIN it{k - 1} p ON p.node = e.src
      JOIN outdeg o ON o.src = e.src
      GROUP BY 1
    ),
    it{k} AS (
      SELECT d.doc_id AS node,
             ((CASE WHEN d.doc_id % 50 = 0 THEN 150000 ELSE 0 END)
              + (85 * COALESCE(s.c, 0)) // 100)::BIGINT AS r
      FROM documents d
      LEFT JOIN s{k} s ON s.node = d.doc_id
    )"""
        )
    parts.append(
        f"\n    SELECT node, r AS rank FROM it{num_iters} ORDER BY node"
    )
    return "".join(parts)


@query("trustrank_scores", _trustrank_sql(3))
def trustrank_scores(sf_dir: str):
    """TrustRank (seed-personalized PageRank, the spam-demotion
    classic): teleport mass restricted to a curated seed whitelist
    (doc_id % 50 = 0 here), so authority flows outward from vetted
    nodes and link farms unreachable from seeds decay to 0. Same
    all-integer contract and both execution regimes as
    stages/graph.pagerank (seeds broadcast; they are small by
    definition)."""
    from doppel_ray.stages import graph

    ds = read_documents(sf_dir, columns=["doc_id"])
    n = ds.count()

    def mk_edges(batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        src = np.repeat(ids, 3)
        i = np.tile(np.arange(1, 4, dtype=np.int64), len(ids))
        dst = (src * 31 + i * 7) % n
        return pa.table(
            {
                "src": pa.array(src, type=pa.int64()),
                "dst": pa.array(dst, type=pa.int64()),
            }
        )

    edges = ds.map_batches(mk_edges, batch_format="pyarrow")
    out = graph.pagerank(
        edges, num_iters=3, seeds=np.arange(0, n, 50, dtype=np.int64)
    )
    return finalize(
        out, pa.schema([("node", pa.int64()), ("rank", pa.int64())])
    )


@query("pagerank_scores", _pagerank_sql(3))
def pagerank_scores(sf_dir: str):
    """Link-authority ranking: 3 iterations of all-integer PageRank
    (stages/graph.py — per iteration: edges join ranks on src, narrow
    (dst, contrib) groupby, left join onto the node set; the broadcast
    regime holds only the O(nodes) rank vector on the driver) over a
    deterministic synthetic link graph derived from doc_id."""
    from doppel_ray.stages import graph

    ds = read_documents(sf_dir, columns=["doc_id"])
    n = ds.count()

    def mk_edges(batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        src = np.repeat(ids, 3)
        i = np.tile(np.arange(1, 4, dtype=np.int64), len(ids))
        dst = (src * 31 + i * 7) % n
        return pa.table(
            {
                "src": pa.array(src, type=pa.int64()),
                "dst": pa.array(dst, type=pa.int64()),
            }
        )

    edges = ds.map_batches(mk_edges, batch_format="pyarrow")
    out = graph.pagerank(edges, num_iters=3)
    return finalize(
        out, pa.schema([("node", pa.int64()), ("rank", pa.int64())])
    )


@query(
    "source_capped_sample",
    """
    SELECT source, doc_id, rnk FROM (
      SELECT source, doc_id,
             row_number() OVER (
               PARTITION BY source
               ORDER BY md5_number_upper(doc_id::VARCHAR), doc_id
             ) AS rnk
      FROM documents
    ) WHERE rnk <= 40
    """,
)
def source_capped_sample(sf_dir: str):
    """Per-source document cap (the Gopher/C4-style per-domain limit
    that stops one host dominating the training mix): keep at most 40
    docs per source, chosen by md5-hash rank so the cap is a
    deterministic uniform sample at any layout or run count
    (stages/rank.py window_rank: ONE bucketed shuffle on source,
    per-bucket prune; the hash order and the SQL's md5_number_upper
    are the same bytes — functions/text.md5_token_hash64)."""
    from doppel_ray.functions.text import md5_token_hash64
    from doppel_ray.stages.rank import window_rank

    ds = read_documents(sf_dir, columns=["doc_id", "source"])

    def add_hash(batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        h = md5_token_hash64(ids.astype(str))
        return batch.append_column("h", pa.array(h, type=pa.uint64()))

    hashed = ds.map_batches(add_hash, batch_format="pyarrow")
    capped = window_rank(
        hashed, "source", ["h", "doc_id"], out_col="rnk", limit=40
    )
    return finalize(
        capped.select_columns(["source", "doc_id", "rnk"]),
        pa.schema(
            [("source", pa.string()), ("doc_id", pa.int64()), ("rnk", pa.int64())]
        ),
    )


@query(
    "inverted_index",
    rf"""
    SELECT token,
           count(*)::BIGINT AS df,
           string_agg(doc_id::VARCHAR, ',' ORDER BY doc_id) AS postings
    FROM (
      SELECT DISTINCT doc_id, t.token
      FROM (
        SELECT doc_id, regexp_extract_all(text, '{A.WS_TOKEN_RE}') AS tk
        FROM documents
      ), UNNEST(tk) AS t(token)
    )
    GROUP BY token
    HAVING count(*) BETWEEN 5 AND 400
    """,
)
def inverted_index(sf_dir: str):
    """Inverted-index build (stages/vocab.py posting_lists): per token
    in df-range [5, 400], the ascending comma-joined doc-id posting
    list — ONE bucketed token shuffle of globally-distinct (token, doc)
    pairs; the df ceiling keeps stopword rows out (a web-scale posting
    list for 'the' is corpus-sized)."""
    from doppel_ray.stages.vocab import posting_lists

    ds = read_documents(sf_dir, columns=["doc_id", "text"])
    out = posting_lists(ds, min_df=5, max_df=400)
    return finalize(
        out,
        pa.schema(
            [("token", pa.string()), ("df", pa.int64()), ("postings", pa.string())]
        ),
    )


@query(
    "source_overlap_matrix",
    rf"""
    WITH t AS (
      SELECT source,
             unnest(regexp_extract_all(lower(text), '{A.WS_TOKEN_RE}')) AS tok
      FROM documents
      UNION ALL
      SELECT source, 'w' || ((doc_id * 13) % 211) AS tok FROM documents
    ),
    d AS (SELECT DISTINCT source, tok FROM t),
    c AS (SELECT source, count(*) AS n FROM d GROUP BY source),
    i AS (SELECT a.source AS sa, b.source AS sb, count(*) AS ni
          FROM d a JOIN d b ON a.tok = b.tok AND a.source < b.source
          GROUP BY 1, 2)
    SELECT ca.source AS sa, cb.source AS sb,
           ca.n::BIGINT AS n_a, cb.n::BIGINT AS n_b,
           COALESCE(i.ni, 0)::BIGINT AS n_common,
           (ca.n + cb.n - COALESCE(i.ni, 0))::BIGINT AS n_union,
           CAST(floor(10000.0 * COALESCE(i.ni, 0)
                      / (ca.n + cb.n - COALESCE(i.ni, 0))) AS BIGINT)
             AS jaccard_bp
    FROM c ca
    JOIN c cb ON ca.source < cb.source
    LEFT JOIN i ON i.sa = ca.source AND i.sb = cb.source
    """,
)
def source_overlap_matrix(sf_dir: str):
    """All-pairs vocabulary overlap between the corpus' k sources —
    the crawl-audit matrix ("which feeds are near-copies of each
    other") in ONE pass via the k-way mask histogram
    (stages/overlap.py): distinct (token, source-bitmask) folds, ONE
    bucketed token shuffle, per-bucket OR + collapse to (mask, count)
    rows; all k*(k-1)/2 pair statistics are then arithmetic over the
    tiny histogram, NOT k^2 set operations. Jaccard reported exactly
    as token_set_overlap does (one IEEE divide of exact integers both
    engines). The template corpus' vocabulary is near-identical across
    sources, so a deterministic per-doc token (``w{(doc_id*13) % 211}``,
    same arithmetic both engines) is spliced in to make the pair
    overlaps non-vacuously distinct — the pii_redaction pattern."""
    import pandas as pd

    from ray.data.aggregate import Count

    from doppel_ray.stages.overlap import mask_histogram, pairwise_overlap

    ds = read_documents(sf_dir, columns=["doc_id", "source", "text"])
    src_rows = (
        ds.select_columns(["source"]).groupby("source").aggregate(Count())
    ).take_all()
    sources = sorted(r["source"] for r in src_rows)
    idx = {s: np.uint32(1) << np.uint32(k) for k, s in enumerate(sources)}

    def tagged(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        s = pc.utf8_lower(batch["text"]).to_pandas()
        toks = s.str.findall(A.WS_TOKEN_RE)
        bits = np.array(
            [idx[v] for v in batch["source"].to_pylist()], dtype=np.uint32
        )
        lens = toks.str.len().to_numpy()
        flat = toks.explode().dropna()
        ids = batch["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        synth = np.char.add("w", ((ids * 13) % 211).astype(str))
        return pa.table(
            {
                "v": pa.array(
                    np.concatenate([flat.to_numpy(), synth]), type=pa.string()
                ),
                "m": pa.array(
                    np.concatenate([np.repeat(bits, lens), bits]),
                    type=pa.uint32(),
                ),
            }
        )

    masks, counts = mask_histogram(ds.map_batches(tagged, batch_format="pyarrow"))
    rows = pairwise_overlap(masks, counts, len(sources))
    sa, sb, na, nb, ni = (
        [sources[r[0]] for r in rows],
        [sources[r[1]] for r in rows],
        np.array([r[2] for r in rows], dtype=np.int64),
        np.array([r[3] for r in rows], dtype=np.int64),
        np.array([r[4] for r in rows], dtype=np.int64),
    )
    union = na + nb - ni
    with np.errstate(divide="ignore", invalid="ignore"):
        bp = np.where(
            union > 0, np.floor(10000.0 * ni / union), 0.0
        ).astype(np.int64)
    return pa.table(
        {
            "sa": pa.array(sa, type=pa.string()),
            "sb": pa.array(sb, type=pa.string()),
            "n_a": pa.array(na, type=pa.int64()),
            "n_b": pa.array(nb, type=pa.int64()),
            "n_common": pa.array(ni, type=pa.int64()),
            "n_union": pa.array(union, type=pa.int64()),
            "jaccard_bp": pa.array(bp, type=pa.int64()),
        }
    )
