"""Corpus-curation queries: PII redaction audit, host-blocklist
filtering, and crawl-frontier selection — the scrub / policy / crawl
feedback stages a web-corpus release pipeline runs after dedup. PII
payloads are synthesized deterministically from ``doc_id`` and spliced
into the REAL ``text`` column (the driver corpus contains no PII), so
the oracle recomputes the intended result with the SAME RE2 chain —
`stages/pii.py` emits both sides from one set of pattern constants.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

from doppel_ray.pipelines import finalize, query
from doppel_ray.sources.parquet import read_documents
from doppel_ray.stages import pii
from doppel_ray.stages.classifier import weight_sql

#: deterministic PII suffix spliced onto each document's real text.
#: SQL and Arrow build it from the same arithmetic; any drift in the
#: redaction chain then breaks the value hash.
_SUFFIX_SQL = (
    "' contact u' || doc_id || '@m' || (doc_id % 13) || '.example"
    " ssn ' || (100 + doc_id % 900) || '-' || (10 + doc_id % 90) ||"
    " '-' || (1000 + doc_id % 9000) || ' tel 555-' ||"
    " (100 + doc_id % 900) || '-' || (1000 + doc_id % 9000) ||"
    " ' from 10.' || (doc_id % 256) || '.0.' || (doc_id % 100)"
)
_PII_TEXT_SQL = f"(text || {_SUFFIX_SQL})"


def _pii_text(batch: pa.Table) -> pa.Array:
    ids = batch["doc_id"].to_numpy(zero_copy_only=False).astype("int64")

    def s(vals) -> pa.Array:
        return pa.array(vals.astype(str), type=pa.string())

    d = s(ids)
    out = pc.binary_join_element_wise(
        pc.cast(batch["text"], pa.string()),
        " contact u", d, "@m", s(ids % 13), ".example ssn ",
        s(100 + ids % 900), "-", s(10 + ids % 90), "-",
        s(1000 + ids % 9000), " tel 555-", s(100 + ids % 900), "-",
        s(1000 + ids % 9000), " from 10.", s(ids % 256), ".0.",
        s(ids % 100), "",
    )
    if isinstance(out, pa.ChunkedArray):
        out = out.combine_chunks()
    return out


@query(
    "encoding_profile",
    r"""
    SELECT doc_id,
           length(text)::BIGINT AS n_chars,
           strlen(text)::BIGINT AS n_bytes,
           len(regexp_extract_all(text, '[^\x00-\x7F]'))::BIGINT
             AS n_nonascii
    FROM documents
    """,
)
def encoding_profile(sf_dir: str):
    """Charset audit (the mojibake/encoding screen a web corpus runs
    before trusting `text`): per document, codepoint count, UTF-8 byte
    count, and non-ASCII codepoint count — bytes >> chars or a high
    non-ASCII share on a claimed-English source flags transcoding bugs.
    Three Arrow kernels per batch, zero shuffles; the RE2 class and
    byte/char length functions agree across both engines."""
    ds = read_documents(sf_dir, columns=["doc_id", "text"])

    def fn(batch: pa.Table) -> pa.Table:
        t = pc.cast(batch["text"], pa.string())
        return pa.table(
            {
                "doc_id": batch["doc_id"],
                "n_chars": pc.cast(pc.utf8_length(t), pa.int64()),
                "n_bytes": pc.cast(pc.binary_length(t), pa.int64()),
                "n_nonascii": pc.cast(
                    pc.count_substring_regex(t, pattern=r"[^\x00-\x7F]"),
                    pa.int64(),
                ),
            }
        )

    return finalize(
        ds.map_batches(fn, batch_format="pyarrow"),
        pa.schema(
            [
                ("doc_id", pa.int64()),
                ("n_chars", pa.int64()),
                ("n_bytes", pa.int64()),
                ("n_nonascii", pa.int64()),
            ]
        ),
    )


@query(
    "warc_ingest",
    """
    SELECT 'https://h' || (doc_id % 23) || '.example/p/' || doc_id AS url,
           TIMESTAMP '2026-01-01' + to_seconds((doc_id % 97) * 60) AS warc_ts,
           strlen(text)::BIGINT AS n_bytes
    FROM documents
    """,
)
def warc_ingest(sf_dir: str):
    """WARC ingestion roundtrip (Common Crawl's wire format): documents
    are serialized into spec-shaped WARC response records (plus a
    warcinfo decoy the parser must skip), concatenated into one segment
    buffer per batch, and re-parsed by sources/warc.py — url, WARC-Date
    timestamp, and payload byte length must survive byte-exactly. The
    parallelism unit is the segment file, matching how Common Crawl
    ships ~1 GB WARCs by the thousand."""
    from doppel_ray.sources.warc import build_warc_record, records_table

    ds = read_documents(sf_dir, columns=["doc_id", "text"])

    def roundtrip(batch: pa.Table) -> pa.Table:
        from datetime import datetime, timedelta

        ids = batch["doc_id"].to_pylist()
        texts = batch["text"].to_pylist()
        base = datetime(2026, 1, 1)
        parts = [
            build_warc_record("ignore:warcinfo", "2026-01-01T00:00:00Z",
                              b"segment header", warc_type="warcinfo")
        ]
        for i, txt in zip(ids, texts):
            ts = base + timedelta(seconds=(i % 97) * 60)
            parts.append(
                build_warc_record(
                    f"https://h{i % 23}.example/p/{i}",
                    ts.strftime("%Y-%m-%dT%H:%M:%SZ"),
                    (txt or "").encode(),
                )
            )
        t = records_table([b"".join(parts)])
        return pa.table(
            {
                "url": t["url"],
                "warc_ts": t["warc_ts"],
                "n_bytes": pc.cast(
                    pc.binary_length(t["payload"]), pa.int64()
                ),
            }
        )

    return finalize(
        ds.map_batches(roundtrip, batch_format="pyarrow"),
        pa.schema(
            [
                ("url", pa.string()),
                ("warc_ts", pa.timestamp("us")),
                ("n_bytes", pa.int64()),
            ]
        ),
    )


@query(
    "warc_http_stats",
    """
    WITH r AS (
      SELECT CASE WHEN doc_id % 10 = 0 THEN 404 ELSE 200 END AS status,
             CASE WHEN doc_id % 7 = 0 THEN 'image/png'
                  ELSE 'text/html' END AS content_type,
             strlen(text)::BIGINT AS nb
      FROM documents
    )
    SELECT status, content_type, count(*)::BIGINT AS n_records,
           sum(nb)::BIGINT AS body_bytes
    FROM r GROUP BY 1, 2
    """,
)
def warc_http_stats(sf_dir: str):
    """Fetch-status rollup over a crawl segment (the first report run
    on a new crawl drop): WARC response payloads carry real HTTP
    responses (status line, Content-Type, body); the chain WARC split
    -> HTTP parse -> narrow (status, content_type) groupby counts
    records and body bytes per class. Record-granular parsing at file
    granularity, one dimension-sized shuffle."""
    from ray.data.aggregate import Count, Sum

    from doppel_ray.sources.warc import (
        build_http_response,
        build_warc_record,
        decode_http,
        records_table,
    )

    ds = read_documents(sf_dir, columns=["doc_id", "text"])

    def segments(batch: pa.Table) -> pa.Table:
        parts = []
        for i, txt in zip(
            batch["doc_id"].to_pylist(), batch["text"].to_pylist()
        ):
            body = (txt or "").encode()
            status = 404 if i % 10 == 0 else 200
            ctype = "image/png" if i % 7 == 0 else "text/html"
            http = build_http_response(
                status, ctype, body, reason="OK" if status == 200 else "NF"
            )
            parts.append(
                build_warc_record(
                    f"https://h{i % 23}.example/p/{i}",
                    "2026-01-01T00:00:00Z",
                    http,
                )
            )
        return records_table([b"".join(parts)])

    recs = decode_http(ds.map_batches(segments, batch_format="pyarrow"))

    def project(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "status": batch["status"],
                "content_type": batch["content_type"],
                "nb": pc.cast(pc.binary_length(batch["body"]), pa.int64()),
            }
        )

    out = (
        recs.map_batches(project, batch_format="pyarrow")
        .groupby(["status", "content_type"])
        .aggregate(
            Count(alias_name="n_records"),
            Sum("nb", alias_name="body_bytes"),
        )
    )
    return finalize(
        out,
        pa.schema(
            [
                ("status", pa.int64()),
                ("content_type", pa.string()),
                ("n_records", pa.int64()),
                ("body_bytes", pa.int64()),
            ]
        ),
    )


@query(
    "dup_rate_by_source",
    """
    WITH h AS (
      SELECT source, count(*) OVER (PARTITION BY text) AS c
      FROM documents
    )
    SELECT source, count(*)::BIGINT AS n_docs,
           sum(CASE WHEN c > 1 THEN 1 ELSE 0 END)::BIGINT AS n_dup_docs
    FROM h GROUP BY source
    """,
)
def dup_rate_by_source(sf_dir: str):
    """Duplication diagnostic per source (which domains flood the
    corpus with copies — the report a curation run uses to re-weight or
    blocklist): per source, total docs and docs whose exact text occurs
    more than once corpus-wide. Narrow (content_hash, source) pairs,
    ONE bucketed hash shuffle (dup flags resolve in-bucket since equal
    hashes co-locate), per-bucket partial (source, n, n_dup) counts,
    then a dimension-sized source groupby. Payloads never shuffle."""
    import numpy as np

    from ray.data.aggregate import Sum

    from doppel_ray.stages import hashes
    from doppel_ray.stages.exact import bucketed_group_apply

    ds = read_documents(sf_dir, columns=["source", "text"])
    keyed = hashes.add_content_hash(ds, text_col="text").select_columns(
        ["content_hash", "source"]
    )

    def per_bucket(g: pa.Table) -> pa.Table:
        df = g.to_pandas()
        dup = df.groupby("content_hash")["source"].transform("size") > 1
        out = (
            df.assign(is_dup=dup.to_numpy().astype("int64"))
            .groupby("source", sort=False)
            .agg(n_docs=("is_dup", "size"), n_dup_docs=("is_dup", "sum"))
            .reset_index()
        )
        return pa.table(
            {
                "source": pa.array(out["source"], type=pa.string()),
                "n_docs": pa.array(
                    out["n_docs"].to_numpy().astype("int64"), type=pa.int64()
                ),
                "n_dup_docs": pa.array(
                    out["n_dup_docs"].to_numpy().astype("int64"),
                    type=pa.int64(),
                ),
            }
        )

    partials = bucketed_group_apply(keyed, "content_hash", per_bucket)
    out = partials.groupby("source").aggregate(
        Sum("n_docs", alias_name="n_docs"),
        Sum("n_dup_docs", alias_name="n_dup_docs"),
    )
    return finalize(
        out,
        pa.schema(
            [
                ("source", pa.string()),
                ("n_docs", pa.int64()),
                ("n_dup_docs", pa.int64()),
            ]
        ),
    )


#: feature-hash bucket count for the fixture classifier weights
_CLF_DIM = 4096

#: soft-sampling hash denominator (keep probability = score / _SOFT_DEN,
#: clamped to [0, 1] — md5-hash thresholding, no RNG)
_SOFT_DEN = 400


@query(
    "soft_quality_sample",
    f"""
    WITH toks AS (
      SELECT doc_id, unnest(regexp_extract_all(text, '\\S+')) AS tok
      FROM documents
    ),
    agg AS (
      SELECT doc_id,
             sum({weight_sql(f'(md5_number_upper(tok) % {_CLF_DIM})::BIGINT')})::BIGINT AS s
      FROM toks GROUP BY doc_id
    )
    SELECT d.doc_id, COALESCE(a.s, 0)::BIGINT AS score
    FROM documents d LEFT JOIN agg a ON d.doc_id = a.doc_id
    WHERE md5_number_upper(CAST(d.doc_id AS VARCHAR)) % {_SOFT_DEN}
          < greatest(least(COALESCE(a.s, 0), {_SOFT_DEN}), 0)
    """,
)
def soft_quality_sample(sf_dir: str):
    """Quality-proportional soft sampling (the FineWeb-Edu-style
    alternative to a hard threshold): each document is kept with
    probability score/DEN via deterministic md5-hash thresholding — no
    RNG, so the sample is identical at any layout, cluster size, or
    re-run, and nests structurally under rate changes (the
    hash_sample property). Classifier actor pool + one vectorized
    compare per batch; zero shuffles."""
    import numpy as np

    from doppel_ray.functions.text import md5_token_hash64
    from doppel_ray.stages import classifier as C

    ds = read_documents(sf_dir, columns=["doc_id", "text"])
    scored = C.score_documents(ds, C.derived_weights(_CLF_DIM))

    def pick(batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_numpy(zero_copy_only=False).astype("int64")
        h = md5_token_hash64(ids.astype(str).astype(object)) % np.uint64(
            _SOFT_DEN
        )
        s = batch["score"].to_numpy(zero_copy_only=False).astype("int64")
        thr = np.clip(s, 0, _SOFT_DEN)
        keep = pa.array(h.astype(np.int64) < thr)
        t = batch.filter(keep)
        return pa.table({"doc_id": t["doc_id"], "score": t["score"]})

    return finalize(
        scored.map_batches(pick, batch_format="pyarrow"),
        pa.schema([("doc_id", pa.int64()), ("score", pa.int64())]),
    )


@query(
    "source_reputation",
    """
    WITH s AS (
      SELECT source, count(*)::BIGINT AS src_docs,
             sum(n_chars)::BIGINT AS src_chars
      FROM documents GROUP BY source
    )
    SELECT d.doc_id, d.source, s.src_docs, s.src_chars
    FROM documents d JOIN s ON d.source = s.source
    """,
)
def source_reputation(sf_dir: str):
    """Domain-reputation features joined back onto every document (the
    FineWeb-style pattern: per-domain statistics feed per-doc filter
    decisions). Aggregate-then-broadcast: ONE narrow (source) groupby
    produces the dimension-sized stats table, ray.put broadcasts it
    once, and the corpus streams through a map-side lookup join
    (stages/joins.broadcast_join) — zero corpus-scale shuffles."""
    from ray.data.aggregate import Count, Sum

    from doppel_ray.stages.joins import broadcast_join

    ds = read_documents(sf_dir, columns=["doc_id", "source", "n_chars"])
    stats = (
        ds.groupby("source")
        .aggregate(
            Count(alias_name="src_docs"),
            Sum("n_chars", alias_name="src_chars"),
        )
    )
    out = broadcast_join(
        ds.select_columns(["doc_id", "source"]),
        stats,
        on="source",
        small_cols=["src_docs", "src_chars"],
    )
    return finalize(
        out,
        pa.schema(
            [
                ("doc_id", pa.int64()),
                ("source", pa.string()),
                ("src_docs", pa.int64()),
                ("src_chars", pa.int64()),
            ]
        ),
    )


@query(
    "recrawl_latest",
    """
    WITH caps AS (
      SELECT 'https://h' || (doc_id % 23) || '.example/p/' || doc_id AS url,
             TIMESTAMP '2026-01-01'
               + to_seconds((doc_id % 97) * 60 + k * 7) AS warc_ts,
             doc_id * 4 + k AS capture_id
      FROM documents, UNNEST(generate_series(0, doc_id % 3)) AS t(k)
    )
    SELECT url, warc_ts, capture_id FROM caps
    QUALIFY row_number() OVER (
      PARTITION BY url ORDER BY warc_ts DESC, capture_id DESC
    ) = 1
    """,
)
def recrawl_latest(sf_dir: str):
    """Recrawl capture versioning (the url+warc_ts shape of the
    north-rule input): each page has 1-3 captures at distinct
    timestamps; keep the newest per url. Per-batch argmax combiner +
    ONE bucketed url shuffle of candidate rows (stages/diff.keep_latest
    — shuffle bounded near output size, never the capture firehose)."""
    import numpy as np

    from doppel_ray.stages.diff import keep_latest

    ds = read_documents(sf_dir, columns=["doc_id"])

    def captures(batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_numpy(zero_copy_only=False).astype("int64")
        counts = 1 + ids % 3
        rep = np.repeat(ids, counts)
        base = np.cumsum(counts) - counts
        k = np.arange(counts.sum(), dtype="int64") - np.repeat(base, counts)
        url = pc.binary_join_element_wise(
            "https://h",
            pa.array((rep % 23).astype(str), type=pa.string()),
            ".example/p/",
            pa.array(rep.astype(str), type=pa.string()),
            "",
        )
        secs = (rep % 97) * 60 + k * 7
        ts = np.datetime64("2026-01-01", "us") + secs.astype(
            "timedelta64[s]"
        ).astype("timedelta64[us]")
        return pa.table(
            {
                "url": pc.cast(url, pa.string()),
                "warc_ts": pa.array(ts, type=pa.timestamp("us")),
                "capture_id": pa.array(rep * 4 + k, type=pa.int64()),
            }
        )

    out = keep_latest(
        ds.map_batches(captures, batch_format="pyarrow"),
        key_col="url",
        ts_col="warc_ts",
        id_col="capture_id",
    )
    return finalize(
        out,
        pa.schema(
            [
                ("url", pa.string()),
                ("warc_ts", pa.timestamp("us")),
                ("capture_id", pa.int64()),
            ]
        ),
    )


@query(
    "classifier_scores",
    f"""
    WITH toks AS (
      SELECT doc_id, unnest(regexp_extract_all(text, '\\S+')) AS tok
      FROM documents
    ),
    agg AS (
      SELECT doc_id,
             sum({weight_sql(f'(md5_number_upper(tok) % {_CLF_DIM})::BIGINT')})::BIGINT AS s
      FROM toks GROUP BY doc_id
    )
    SELECT d.doc_id,
           COALESCE(agg.s, 0)::BIGINT AS score,
           COALESCE(agg.s, 0) >= 0 AS keep
    FROM documents d LEFT JOIN agg ON d.doc_id = agg.doc_id
    """,
)
def classifier_scores(sf_dir: str):
    """fastText-style hashed-linear quality scoring: every document
    gets an all-integer bag-of-words score under a broadcast weight
    vector (``hash(token) % dim`` feature buckets) plus the
    keep/drop threshold label — the model-inference curation shape.
    Weight vector rides ``ray.put`` → per-ACTOR fetch (stateful actor
    pool), scoring is one segmented gather-sum per batch, zero
    shuffles. Weights here are the deterministic fixture vector so the
    oracle recomputes scores from the same modular formula; a trained
    model drops in as the same int64 array."""
    from doppel_ray.stages import classifier as C

    ds = read_documents(sf_dir, columns=["doc_id", "text"])
    out = C.score_documents(ds, C.derived_weights(_CLF_DIM))

    def project(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "doc_id": batch["doc_id"],
                "score": batch["score"],
                "keep": batch["keep"],
            }
        )

    return finalize(
        out.map_batches(project, batch_format="pyarrow"),
        pa.schema(
            [
                ("doc_id", pa.int64()),
                ("score", pa.int64()),
                ("keep", pa.bool_()),
            ]
        ),
    )


#: UT1-style source blocklist: every third source id. Built from one
#: arithmetic on both sides; blocking ids beyond the corpus' source
#: universe is harmless (set membership, not a join).
_BLOCK_N = 34


@query(
    "blocklist_filter",
    f"""
    SELECT doc_id, source FROM documents
    WHERE source NOT IN (
      SELECT 'src' || (3 * x) FROM generate_series(0, {_BLOCK_N - 1}) t(x)
    )
    """,
)
def blocklist_filter(sf_dir: str):
    """Domain-blocklist filtering (the UT1/adult-list scrub every web
    corpus applies): a small explicit blocklist of sources rides in the
    task closure (broadcast once per worker — it is a policy artifact
    of fixed size, never corpus-scale) and each batch drops blocked
    rows via one vectorized ``is_in``. Zero shuffles; at 100 TB this is
    a pure streaming filter."""
    ds = read_documents(sf_dir, columns=["doc_id", "source"])
    blocked = pa.array(
        [f"src{3 * i}" for i in range(_BLOCK_N)], type=pa.string()
    )

    def fn(batch: pa.Table) -> pa.Table:
        keep = pc.invert(
            pc.fill_null(pc.is_in(batch["source"], value_set=blocked), False)
        )
        return batch.filter(keep)

    return finalize(
        ds.map_batches(fn, batch_format="pyarrow"),
        pa.schema([("doc_id", pa.int64()), ("source", pa.string())]),
    )


@query(
    "curation_funnel",
    f"""
    WITH toks AS (
      SELECT doc_id, unnest(regexp_extract_all(text, '\\S+')) AS tok
      FROM documents
    ),
    agg AS (
      SELECT doc_id,
             sum({weight_sql(f'(md5_number_upper(tok) % {_CLF_DIM})::BIGINT')})::BIGINT AS s
      FROM toks GROUP BY doc_id
    ),
    pre AS (
      SELECT d.doc_id, d.text,
             CASE WHEN d.source IN (
                    SELECT 'src' || (3 * x)
                    FROM generate_series(0, {_BLOCK_N - 1}) t(x)
                  ) THEN 'blocked'
                  WHEN COALESCE(a.s, 0) < 0 THEN 'low_quality'
             END AS p
      FROM documents d LEFT JOIN agg a ON d.doc_id = a.doc_id
    ),
    surv AS (
      SELECT doc_id,
             CASE WHEN doc_id = min(doc_id) OVER (PARTITION BY text)
                  THEN 'kept' ELSE 'duplicate' END AS st
      FROM pre WHERE p IS NULL
    )
    SELECT pre.doc_id, COALESCE(pre.p, surv.st) AS status
    FROM pre LEFT JOIN surv ON pre.doc_id = surv.doc_id
    """,
)
def curation_funnel(sf_dir: str):
    """The intake-funnel ledger a curation run publishes: every
    document labeled blocked (source blocklist) -> low_quality
    (hashed-linear classifier score < 0) -> duplicate (exact keep-first
    among the docs REACHING the dedup gate, matching real funnel order)
    -> kept. Gate order is load-bearing: blocked docs are never scored,
    filtered docs never hash. Scale shape: streaming filters + the
    classifier actor pool on survivors only, then ONE bucketed
    content-hash shuffle of narrow (hash, id) pairs resolving
    kept/duplicate via in-bucket window-min (stages/curation.py)."""
    from doppel_ray.stages import classifier as C
    from doppel_ray.stages.curation import LEDGER_SCHEMA, funnel_ledger

    ds = read_documents(sf_dir, columns=["doc_id", "source", "text"])
    blocked_set = pa.array(
        [f"src{3 * i}" for i in range(_BLOCK_N)], type=pa.string()
    )

    def split_blocked(batch: pa.Table) -> pa.Table:
        b = pc.fill_null(
            pc.is_in(batch["source"], value_set=blocked_set), False
        )
        return batch.append_column("blocked", b)

    lab = ds.map_batches(split_blocked, batch_format="pyarrow")
    out = funnel_ledger(lab, C.derived_weights(_CLF_DIM))
    return finalize(out, LEDGER_SCHEMA)


@query(
    "pii_redaction",
    f"""
    WITH v AS (SELECT doc_id, {_PII_TEXT_SQL} AS t FROM documents)
    SELECT doc_id,
           {pii.count_sql('t', 'email')} AS n_email,
           {pii.count_sql('t', 'id')} AS n_id,
           {pii.count_sql('t', 'phone')} AS n_phone,
           {pii.count_sql('t', 'ip')} AS n_ip,
           {pii.redacted_sql('t')} AS text_redacted
    FROM v
    """,
)
def pii_redaction(sf_dir: str):
    """PII scrub audit: per document, the redacted text plus per-class
    hit counts (emails, SSN-style ids, phones, IPv4s) taken before
    rewriting. Pure vectorized RE2 map over (real text + deterministic
    PII splice) — zero shuffle; stages/pii.py emits the oracle SQL from
    the same pattern constants."""
    ds = read_documents(sf_dir, columns=["doc_id", "text"])

    def fn(batch: pa.Table) -> pa.Table:
        t = _pii_text(batch)
        cols: dict = {"doc_id": batch["doc_id"]}
        counts = pii.pii_counts(t)
        cols["n_email"] = counts["n_email"]
        cols["n_id"] = counts["n_id"]
        cols["n_phone"] = counts["n_phone"]
        cols["n_ip"] = counts["n_ip"]
        cols["text_redacted"] = pii.redact_text(t)
        return pa.table(cols)

    return finalize(
        ds.map_batches(fn, batch_format="pyarrow"),
        pa.schema(
            [
                ("doc_id", pa.int64()),
                ("n_email", pa.int64()),
                ("n_id", pa.int64()),
                ("n_phone", pa.int64()),
                ("n_ip", pa.int64()),
                ("text_redacted", pa.string()),
            ]
        ),
    )


from doppel_ray.stages import mojibake as _mj

#: deterministic mojibake splice by doc_id % 4 (3 -> clean), built
#: from the rule constants so it can't drift; shared verbatim with
#: the SQL CASE below so both engines see the same text
_MJ_SPLICES: dict[int, str] = {
    0: " caf" + _mj.MOJIBAKE_FIXES[3][0] + " menu",      # Ã©
    1: " don" + _mj.MOJIBAKE_FIXES[0][0] + "t stop",     # â€™
    2: " na" + _mj.MOJIBAKE_FIXES[9][0] + "ve"           # Ã¯
       + _mj.MOJIBAKE_FIXES[10][0] + "plan",             # Â<nbsp>
}


def _mj_case_sql() -> str:
    whens = " ".join(
        f"WHEN {k} THEN '" + v.replace("'", "''") + "'"
        for k, v in _MJ_SPLICES.items()
    )
    return f"(text || CASE doc_id % 4 {whens} ELSE '' END)"


@query(
    "mojibake_repair",
    f"""
    WITH v AS (SELECT doc_id, {_mj_case_sql()} AS t FROM documents)
    SELECT doc_id,
           {_mj.fixed_sql('t')} AS text_fixed,
           {_mj.count_sql('t')} AS n_mojibake
    FROM v
    """,
)
def mojibake_repair(sf_dir: str):
    """Encoding repair (ftfy-lite): fix UTF-8-as-Latin-1 mojibake via a
    fixed literal-replacement chain and count hits before rewriting
    (stages/mojibake.py — pure vectorized Arrow kernels, zero shuffle).
    Non-vacuous via a deterministic mojibake splice derived from doc_id
    on both engines (3 of every 4 docs get one)."""
    ds = read_documents(sf_dir, columns=["doc_id", "text"])

    def augment(batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_numpy(zero_copy_only=False)
        frag = pa.array(
            [_MJ_SPLICES.get(int(i) % 4, "") for i in ids],
            type=pa.string(),
        )
        t = pc.binary_join_element_wise(
            pc.cast(batch["text"], pa.string()), frag, ""
        )
        return pa.table({"doc_id": batch["doc_id"], "text": t})

    out = _mj.fix_mojibake(ds.map_batches(augment, batch_format="pyarrow"))
    return finalize(
        out,
        pa.schema(
            [
                ("doc_id", pa.int64()),
                ("text_fixed", pa.string()),
                ("n_mojibake", pa.int64()),
            ]
        ),
    )


#: 128-char intro (2 aligned 64-char blocks) shared by every third doc
#: — makes corpus-wide duplicated blocks non-vacuous on both engines
_BLK_INTRO = "HDR0" * 32


@query(
    "block_dedup_stats",
    f"""
    WITH aug AS (
      SELECT source,
             CASE WHEN doc_id % 3 = 0 THEN '{_BLK_INTRO}' || text
                  ELSE text END AS t
      FROM documents
    ),
    blocks AS (
      SELECT source, md5_number_upper(substr(t, i, 64)) AS h
      FROM aug, UNNEST(generate_series(1, length(t), 64)) AS u(i)
    ),
    dup AS (
      SELECT h FROM blocks GROUP BY h HAVING count(*) > 1
    )
    SELECT source, count(*)::BIGINT AS n_blocks,
           count(*) FILTER (WHERE h IN (SELECT h FROM dup))::BIGINT
             AS n_dup_blocks
    FROM blocks GROUP BY source
    """,
)
def block_dedup_stats(sf_dir: str):
    """Sub-file storage dedup, fixed-block baseline (stages/cdc.py
    block_dedup_stats): 64-char blocks hashed with the shared md5-low64
    kernel, corpus-wide duplicated-block set via the bucketed count +
    broadcast, per-source rollup in a second streaming pass — payload
    text never shuffles. Non-vacuous via a 128-char intro prepended to
    every third doc on both engines."""
    from doppel_ray.stages.cdc import block_dedup_stats as _bds

    ds = read_documents(sf_dir, columns=["doc_id", "source", "text"])

    def augment(batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_numpy(zero_copy_only=False)
        frag = pa.array(
            [(_BLK_INTRO if int(i) % 3 == 0 else "") for i in ids],
            type=pa.string(),
        )
        t = pc.binary_join_element_wise(
            frag, pc.cast(batch["text"], pa.string()), ""
        )
        return pa.table({"source": batch["source"], "text": t})

    out = _bds(ds.map_batches(augment, batch_format="pyarrow"), block=64)
    return finalize(
        out,
        pa.schema(
            [
                ("source", pa.string()),
                ("n_blocks", pa.int64()),
                ("n_dup_blocks", pa.int64()),
            ]
        ),
    )


@query("cdc_dedup_report")  # rows-only: byte-level content-defined
# chunk boundaries have no SQL analog; the boundary rule and every
# count are pinned against a pure-Python reference chunker in
# tests/test_cdc.py, and the report is all-integer + layout-invariant
def cdc_dedup_report(sf_dir: str):
    """Content-defined-chunking dedup report (stages/cdc.py): each doc
    becomes a binary payload with a 512-byte shared header on every
    third doc (template-sharing pages); FastCDC-style chunking (rolling
    16-byte window hash, 6-bit boundary mask, 32-byte min), one
    bucketed chunk-hash count, ONE corpus report row with bytes saved
    by storing each distinct chunk once."""
    from doppel_ray.stages.cdc import cdc_dedup_stats

    ds = read_documents(sf_dir, columns=["doc_id", "text"])
    header = (b"<tpl>" + b"HDRB" * 126 + b"</t>")  # 512 bytes

    def to_payload(batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_numpy(zero_copy_only=False)
        texts = batch["text"].to_pylist()
        payload = [
            (header if int(i) % 3 == 0 else b"") + (t or "").encode()
            for i, t in zip(ids, texts)
        ]
        return pa.table(
            {
                "doc_id": batch["doc_id"],
                "html": pa.array(payload, type=pa.binary()),
            }
        )

    return cdc_dedup_stats(
        ds.map_batches(to_payload, batch_format="pyarrow"),
    )
