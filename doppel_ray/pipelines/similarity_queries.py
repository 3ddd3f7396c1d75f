"""Near-duplicate queries over the driver-provided ``documents`` table.

Every query here except ``ivf_topk`` (approximate by design: n_probe <
n_clusters) is oracle-paired: exact-Jaccard and containment by
brute-force SQL self-joins, MinHash at the verified-exact threshold,
SimHash by full fingerprint recomputation in SQL (md5 token-hash mode),
and the embedding queries by ``list_cosine_similarity`` with documented
float-margin arguments.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from doppel_ray.pipelines import finalize, query
from doppel_ray.sources.parquet import read_documents
from doppel_ray.stages import cluster, minhash
from doppel_ray.stages.util import collect_table


def _edges_to_ids(
    edges, value_col: str | None = None, value_type: pa.DataType | None = None
) -> pa.Table:
    """(url_a, url_b[, value]) edges -> int id pair table (vectorized —
    zero-padded url ids cast straight back to int64, no row dicts)."""
    import pyarrow.compute as pc

    cols = ["url_a", "url_b"] + ([value_col] if value_col else [])
    t = collect_table(edges.select_columns(cols))
    if t.num_rows == 0:
        out = {
            "id_a": pa.array([], type=pa.int64()),
            "id_b": pa.array([], type=pa.int64()),
        }
        if value_col:
            out[value_col] = pa.array([], type=value_type or pa.float64())
        return pa.table(out)
    out = {
        "id_a": pc.cast(t["url_a"], pa.int64()),
        "id_b": pc.cast(t["url_b"], pa.int64()),
    }
    if value_col:
        out[value_col] = pc.cast(t[value_col], value_type) if value_type else t[value_col]
    return pa.table(out)


def _docs_as_pages(sf_dir: str):
    """documents -> (url, text) with zero-padded ids so string order ==
    numeric order (stable pair orientation and cluster labels)."""
    ds = read_documents(sf_dir, columns=["doc_id", "text"])

    def fn(batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_pylist()
        return pa.table(
            {
                "url": pa.array([f"{i:012d}" for i in ids]),
                "text": batch["text"],
            }
        )

    return ds.map_batches(fn, batch_format="pyarrow")


PAIRS_SCHEMA = pa.schema(
    [("id_a", pa.int64()), ("id_b", pa.int64()), ("similarity", pa.float64())]
)


@query(
    "near_dup_pairs_exact",
    """
    SELECT a.doc_id AS id_a, b.doc_id AS id_b, 1.0 AS similarity
    FROM documents a JOIN documents b
      ON a.text = b.text AND a.doc_id < b.doc_id
    """,
)
def near_dup_pairs_exact(sf_dir: str):
    """Full MinHash->LSH->verify pipeline at threshold 1.0 (no
    normalization): must recover exactly the identical-text pairs."""
    ds = _docs_as_pages(sf_dir)
    cfg = minhash.MinHashConfig(threshold=1.0, normalize=False, verify_mode="exact")
    edges = minhash.near_dup_edges(ds, cfg)
    return _edges_to_ids(edges, "similarity", pa.float64()).cast(PAIRS_SCHEMA)


@query(
    "minhash_near_dup",
    # Brute-force exact-Jaccard over DISTINCT 5-char shingles of the
    # normalized text (lower + collapse-ws + trim), integer threshold
    # arithmetic (5i >= 4u <=> i/u >= 0.8 for u << 2^52 — no float in the
    # compared output). Matches the pipeline because verification IS
    # exact set-Jaccard at tau=0.8 and the LSH miss probability at the
    # observed similarity margins is < 1e-9 with r=4, b=32 (recall >=
    # 0.99 pinned in tests/test_minhash.py); verified pair-for-pair at
    # sf0.01 and sf0.1 (VERDICT r2 #7 promotion from rows-only).
    r"""
    WITH norm AS (
      SELECT doc_id, trim(regexp_replace(lower(text), '\s+', ' ', 'g')) AS t
      FROM documents
    ),
    sh AS (
      SELECT DISTINCT doc_id, substr(t, i, 5) AS s
      FROM norm, LATERAL (SELECT unnest(generate_series(1, strlen(t) - 4)) AS i)
      WHERE strlen(t) >= 5
    ),
    sizes AS (SELECT doc_id, count(*) AS c FROM sh GROUP BY doc_id),
    inter AS (
      SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS i
      FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
      GROUP BY 1, 2
    )
    SELECT id_a, id_b
    FROM inter
    JOIN sizes sa ON sa.doc_id = inter.id_a
    JOIN sizes sb ON sb.doc_id = inter.id_b
    WHERE 5 * i >= 4 * (sa.c + sb.c - i)
    """,
)
def minhash_near_dup(sf_dir: str):
    """Standard near-dedup config (tau=0.8, normalized shingles); output
    is the integer pair set only — similarity stays out of the compared
    columns (float-free oracle invariant)."""
    ds = _docs_as_pages(sf_dir)
    edges = minhash.near_dup_edges(ds, minhash.MinHashConfig())
    return _edges_to_ids(edges)


@query(
    "dup_clusters",
    """
    SELECT count(*) AS cluster_size, min(doc_id) AS cluster_id
    FROM documents
    GROUP BY text
    HAVING count(*) > 1
    """,
)
def dup_clusters(sf_dir: str):
    """Connected components over verified exact-dup edges (threshold 1.0):
    component sizes+labels must equal identical-text group sizes+min-ids
    (texts are transitively equal, so components == groups)."""
    ds = _docs_as_pages(sf_dir)
    cfg = minhash.MinHashConfig(threshold=1.0, normalize=False, verify_mode="exact")
    edges = minhash.near_dup_edges(ds, cfg)
    labels = cluster.cluster_edges(edges)
    if not labels:
        return pa.table(
            {
                "cluster_size": pa.array([], type=pa.int64()),
                "cluster_id": pa.array([], type=pa.int64()),
            }
        )
    sizes: dict[str, int] = {}
    for u, c in labels.items():
        sizes[c] = sizes.get(c, 0) + 1
    items = sorted(sizes.items())
    return pa.table(
        {
            "cluster_size": pa.array([v for _, v in items], type=pa.int64()),
            "cluster_id": pa.array([int(k) for k, _ in items], type=pa.int64()),
        }
    )


@query(
    "simhash_near_dup",
    # Full SimHash recomputation in SQL (VERDICT r2 #7 promotion from
    # rows-only): token hash = md5_number_upper (== little-endian first
    # 8 md5 bytes, the pipeline's token_hash="md5" mode), majority bit
    # vote 2*bitsum > count, zero-token docs -> fingerprint 0, then the
    # brute-force Hamming<=3 pair join. The pipeline side is exact by
    # pigeonhole (bands=4 > max_hamming=3) + popcount verify, with
    # band_cap lifted so no ring pruning occurs — so the two pair sets
    # coincide pair-for-pair (verified at sf0.01 and sf0.1).
    r"""
    WITH norm AS (
      SELECT doc_id, trim(regexp_replace(lower(text), '\s+', ' ', 'g')) AS t
      FROM documents
    ),
    tok AS (
      SELECT doc_id, unnest(regexp_extract_all(t, '\S+')) AS s FROM norm
    ),
    th AS (SELECT doc_id, md5_number_upper(s) AS h FROM tok),
    cnt AS (SELECT doc_id, count(*) AS c FROM th GROUP BY doc_id),
    bitsum AS (
      SELECT th.doc_id, j.j,
             count(*) FILTER (((h >> j.j::UBIGINT) & 1::UBIGINT) = 1::UBIGINT) AS bs
      FROM th CROSS JOIN (SELECT unnest(generate_series(0, 63)) AS j) j
      GROUP BY 1, 2
    ),
    fp0 AS (
      SELECT bitsum.doc_id,
             bit_or(CASE WHEN 2 * bs > c
                         THEN ((1::UHUGEINT << j::UHUGEINT)::UBIGINT)
                         ELSE 0::UBIGINT END) AS f
      FROM bitsum JOIN cnt USING (doc_id)
      GROUP BY bitsum.doc_id
    ),
    fp AS (
      SELECT d.doc_id, coalesce(fp0.f, 0::UBIGINT) AS f
      FROM documents d LEFT JOIN fp0 ON d.doc_id = fp0.doc_id
    )
    SELECT a.doc_id AS id_a, b.doc_id AS id_b,
           bit_count(xor(a.f, b.f))::BIGINT AS hamming
    FROM fp a JOIN fp b ON a.doc_id < b.doc_id
    WHERE bit_count(xor(a.f, b.f)) <= 3
    """,
)
def simhash_near_dup(sf_dir: str):
    """SimHash fingerprints + pigeonhole block candidates at Hamming<=3
    (Manku/Jain/Sarma WWW'07); exact popcount verification. Oracle mode:
    md5 token hash (SQL-reproducible) and an unbounded band cap so the
    pipeline's pair set is the complete Hamming<=3 relation."""
    from doppel_ray.stages import simhash

    ds = _docs_as_pages(sf_dir)
    cfg = simhash.SimHashConfig(token_hash="md5", band_cap=1 << 30)
    edges = simhash.simhash_edges(ds, cfg)
    return _edges_to_ids(edges, "hamming", pa.int64())


@query(
    "containment_pairs",
    """
    SELECT a.doc_id AS id_a, b.doc_id AS id_b
    FROM documents a JOIN documents b
      ON a.doc_id != b.doc_id
     AND strlen(a.text) >= 8
     AND strlen(a.text) < strlen(b.text)
     AND contains(b.text, a.text)
    """,
)
def containment_pairs(sf_dir: str):
    """Exact-substring containment (suffix-array probe path + CDC anchor
    grams) over raw text; oracle is the brute-force SQL self-join."""
    from doppel_ray.stages import substring

    ds = _docs_as_pages(sf_dir)
    cfg = substring.ContainmentConfig(normalize=False)
    edges = substring.containment_edges(ds, cfg)
    return _edges_to_ids(edges)


@query(
    "ann_topk",
    """
    SELECT q.vec_id AS query_id, x.vec_id AS neighbor_id
    FROM embeddings q JOIN embeddings x ON x.vec_id != q.vec_id
    WHERE q.vec_id < 8
    QUALIFY row_number() OVER (
        PARTITION BY q.vec_id
        ORDER BY list_cosine_similarity(q.embedding, x.embedding) DESC,
                 x.vec_id
    ) <= 10
    """,
)
def ann_topk(sf_dir: str):
    """Brute-force cosine top-10 for the first 8 vectors as queries
    (broadcast query matrix, one matmul per batch, bucketed merge).
    Integer-only output: the empirical k-boundary margin (>=1e-3 at
    sf0.01) dwarfs DuckDB's float32 accumulation noise (~2e-7), so the
    neighbor SET is oracle-stable."""
    import numpy as np

    from doppel_ray.sources.parquet import read_embeddings
    from doppel_ray.stages import ann

    ds = read_embeddings(sf_dir, columns=["vec_id", "embedding"])
    qrows = ds.filter(expr="vec_id < 8").take_all()
    qrows.sort(key=lambda r: r["vec_id"])
    qm = np.array([r["embedding"] for r in qrows], dtype=np.float64)
    qids = np.array([r["vec_id"] for r in qrows], dtype=np.int64)
    out = ann.cosine_topk(ds, qm, qids, k=10)
    rows = out.take_all()
    return pa.table(
        {
            "query_id": pa.array([r["query_id"] for r in rows], type=pa.int64()),
            "neighbor_id": pa.array(
                [r["neighbor_id"] for r in rows], type=pa.int64()
            ),
        }
    )


@query(
    "hard_negatives",
    # contrastive-pair mining: for each query vector, the single most
    # similar vector with a DIFFERENT label. Integer-only output; the
    # rank-1 boundary margin dwarfs DuckDB's float32 accumulation noise
    # (same stance as ann_topk).
    """
    SELECT q.vec_id AS query_id, x.vec_id AS negative_id
    FROM embeddings q JOIN embeddings x
      ON x.vec_id != q.vec_id AND x.label != q.label
    WHERE q.vec_id < 16
    QUALIFY row_number() OVER (
        PARTITION BY q.vec_id
        ORDER BY list_cosine_similarity(q.embedding, x.embedding) DESC,
                 x.vec_id
    ) = 1
    """,
)
def hard_negatives(sf_dir: str):
    """Hard-negative mining for contrastive training: nearest
    cross-label neighbor for each of the first 16 vectors, via the
    broadcast-query blocked matmul with same-label candidates masked
    (stages/ann.py cosine_topk label regime)."""
    import numpy as np

    from doppel_ray.sources.parquet import read_embeddings
    from doppel_ray.stages import ann

    ds = read_embeddings(sf_dir, columns=["vec_id", "embedding", "label"])
    qrows = ds.filter(expr="vec_id < 16").take_all()
    qrows.sort(key=lambda r: r["vec_id"])
    qm = np.array([r["embedding"] for r in qrows], dtype=np.float64)
    qids = np.array([r["vec_id"] for r in qrows], dtype=np.int64)
    qlabels = np.array([r["label"] for r in qrows], dtype=np.int64)
    out = ann.cosine_topk(
        ds, qm, qids, k=1, label_col="label", query_labels=qlabels
    )
    rows = out.take_all()
    rows.sort(key=lambda r: r["query_id"])
    return pa.table(
        {
            "query_id": pa.array(
                [r["query_id"] for r in rows], type=pa.int64()
            ),
            "negative_id": pa.array(
                [r["neighbor_id"] for r in rows], type=pa.int64()
            ),
        }
    )


@query(
    "embedding_near_dup",
    """
    SELECT a.vec_id AS id_a, b.vec_id AS id_b
    FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
    WHERE list_cosine_similarity(a.embedding, b.embedding) >= 0.45
    """,
)
def embedding_near_dup(sf_dir: str):
    """Random-hyperplane LSH candidates + exact float64 cosine verify at
    tau=0.45 (empirical margin to the threshold ~5e-4 at sf0.01 >>
    float32 noise; P(LSH miss) < 1e-5 at this angle with r=4, b=64)."""
    from doppel_ray.sources.parquet import read_embeddings
    from doppel_ray.stages import ann

    ds = read_embeddings(sf_dir, columns=["vec_id", "embedding"])
    edges = ann.embedding_near_dup_edges(ds, ann.CosineLSHConfig(threshold=0.45))
    rows = edges.take_all()
    return pa.table(
        {
            "id_a": pa.array([r["id_a"] for r in rows], type=pa.int64()),
            "id_b": pa.array([r["id_b"] for r in rows], type=pa.int64()),
        }
    )


@query(
    "top_similar_pairs",
    """
    WITH sims AS (
      SELECT a.vec_id AS id_a, b.vec_id AS id_b,
             floor(list_cosine_similarity(
               a.embedding::DOUBLE[], b.embedding::DOUBLE[]) * 1000000
             )::BIGINT AS sim_q
      FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
      WHERE list_cosine_similarity(
              a.embedding::DOUBLE[], b.embedding::DOUBLE[]) >= 0.45
    )
    SELECT id_a, id_b, sim_q FROM sims
    ORDER BY sim_q DESC, id_a, id_b LIMIT 10
    """,
)
def top_similar_pairs(sf_dir: str):
    """Global top-10 most-similar embedding pairs (the 'what should I
    eyeball first' audit after a near-dup run): LSH-candidate + exact
    float64 verify edges, similarity quantized to floored micro-units
    (the repo's cross-engine float contract), then the block-pruned
    global top-k — shuffle volume k x blocks, never the pair stream.
    Total order (sim_q DESC, id_a, id_b) makes the cut deterministic."""
    import numpy as np

    from doppel_ray.sources.parquet import read_embeddings
    from doppel_ray.stages import ann
    from doppel_ray.stages.rank import global_topk

    ds = read_embeddings(sf_dir, columns=["vec_id", "embedding"])
    edges = ann.embedding_near_dup_edges(
        ds, ann.CosineLSHConfig(threshold=0.45)
    )

    def quantize(batch: pa.Table) -> pa.Table:
        s = batch["similarity"].to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "id_a": batch["id_a"],
                "id_b": batch["id_b"],
                "sim_q": pa.array(
                    np.floor(s * 1e6).astype("int64"), type=pa.int64()
                ),
            }
        )

    top = global_topk(
        edges.map_batches(quantize, batch_format="pyarrow"),
        ["sim_q", "id_a", "id_b"],
        ascending=[False, True, True],
        k=10,
    )
    return finalize(
        top,
        pa.schema(
            [("id_a", pa.int64()), ("id_b", pa.int64()), ("sim_q", pa.int64())]
        ),
    )


#: per-query recall@k floor the ivf_topk query ASSERTS against its own
#: brute-force baseline (mean across queries). The synthetic embeddings
#: are near-uniform on the sphere — the worst case for cell pruning —
#: and n_probe=8/16 measures mean recall 0.81-0.84 at sf0.001/sf0.01;
#: the floor leaves ~0.15 headroom while still catching a broken
#: quantizer or probe routing (which craters recall to ~n_probe/n_cells
#: of a random subset).
IVF_RECALL_FLOOR = 0.65


@query("ivf_topk")  # rows-only: approximate (n_probe < n_clusters)
def ivf_topk(sf_dir: str):
    """IVF scale path: coarse k-means quantizer (driver-trained on a
    sample, broadcast), per-batch cell pruning to n_probe cells per
    query, then the same partial-top-k merge as the exhaustive baseline.

    The accuracy contract is driver-visible (VERDICT r3 #4): each row
    carries ``recall_at_k`` — the fraction of the EXACT brute-force
    top-k (same queries, computed in-query) that the IVF result
    recovered for that query — and the query raises if the mean drops
    below ``IVF_RECALL_FLOOR``. Tests additionally pin recall on
    clustered data (tests/test_ann.py)."""
    import numpy as np

    from doppel_ray.sources.parquet import read_embeddings
    from doppel_ray.stages import ann

    ds = read_embeddings(sf_dir, columns=["vec_id", "embedding"])
    qrows = ds.filter(expr="vec_id < 8").take_all()
    qrows.sort(key=lambda r: r["vec_id"])
    qm = np.array([r["embedding"] for r in qrows], dtype=np.float64)
    qids = np.array([r["vec_id"] for r in qrows], dtype=np.int64)
    cfg = ann.IVFConfig(n_clusters=16, n_probe=8)
    rows = ann.ivf_topk(ds, qm, qids, k=10, cfg=cfg).take_all()
    exact_rows = ann.cosine_topk(ds, qm, qids, k=10).take_all()

    exact_sets: dict[int, set] = {}
    for r in exact_rows:
        exact_sets.setdefault(r["query_id"], set()).add(r["neighbor_id"])
    got_sets: dict[int, set] = {}
    for r in rows:
        got_sets.setdefault(r["query_id"], set()).add(r["neighbor_id"])
    recall = {
        q: len(got_sets.get(q, set()) & exact_sets[q]) / len(exact_sets[q])
        for q in exact_sets
    }
    mean_recall = sum(recall.values()) / max(1, len(recall))
    if mean_recall < IVF_RECALL_FLOOR:
        raise RuntimeError(
            f"ivf_topk recall contract violated: mean recall@10 "
            f"{mean_recall:.3f} < {IVF_RECALL_FLOOR} (per-query {recall})"
        )
    return pa.table(
        {
            "query_id": pa.array([r["query_id"] for r in rows], type=pa.int64()),
            "neighbor_id": pa.array([r["neighbor_id"] for r in rows], type=pa.int64()),
            "rank": pa.array([r["rank"] for r in rows], type=pa.int64()),
            "recall_at_k": pa.array(
                [recall.get(r["query_id"], 0.0) for r in rows], type=pa.float64()
            ),
        }
    )


@query("semdedup")  # rows-only: k-means + float cosine, no SQL analog
def semdedup_verdicts(sf_dir: str):
    """SemDeDup semantic dedup over the embeddings table
    (stages/semdedup.py): deterministic hash-sampled k-means, broadcast
    centroid assignment, one bucketed in-cluster pass emitting every
    row's verdict — (vec_id, cluster, cent_sim, max_prior_sim, kept).
    Row count always equals the corpus, so the driver's rows-only check
    is non-vacuous; kept-set invariants are pinned in
    tests/test_semdedup.py (planted duplicate groups keep exactly one
    member; brute-force parity at n_clusters=1)."""
    from doppel_ray.sources.parquet import read_embeddings
    from doppel_ray.stages.semdedup import SemDeDupConfig, semantic_dedup

    ds = read_embeddings(sf_dir, columns=["vec_id", "embedding"])
    cfg = SemDeDupConfig(n_clusters=8, train_num=1000, train_den=1000)
    out = semantic_dedup(ds, cfg)
    return finalize(
        out,
        pa.schema(
            [
                ("vec_id", pa.int64()),
                ("cluster", pa.int64()),
                ("cent_sim", pa.float64()),
                ("max_prior_sim", pa.float64()),
                ("kept", pa.bool_()),
            ]
        ),
    )


@query(
    "near_dedup_keep_first",
    # Same exact-Jaccard pair base as minhash_near_dup, then connected
    # components via a recursive transitive-closure CTE (min reachable id
    # == union-find min-label) and keep-first = docs that are their
    # component's min id plus all unclustered docs. MATERIALIZED hints
    # keep the shingle join out of the recursion loop (it re-evaluates
    # otherwise and blows up past sf0.01). Verified row-for-row at
    # sf0.01 (476) and sf0.1 (4756) — VERDICT r2 #7 promotion.
    r"""
    WITH RECURSIVE
    norm AS (
      SELECT doc_id, trim(regexp_replace(lower(text), '\s+', ' ', 'g')) AS t
      FROM documents
    ),
    sh AS MATERIALIZED (
      SELECT DISTINCT doc_id, substr(t, i, 5) AS s
      FROM norm, LATERAL (SELECT unnest(generate_series(1, strlen(t) - 4)) AS i)
      WHERE strlen(t) >= 5
    ),
    sizes AS (SELECT doc_id, count(*) AS c FROM sh GROUP BY doc_id),
    inter AS (
      SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS i
      FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
      GROUP BY 1, 2
    ),
    pr AS MATERIALIZED (
      SELECT id_a, id_b
      FROM inter
      JOIN sizes sa ON sa.doc_id = inter.id_a
      JOIN sizes sb ON sb.doc_id = inter.id_b
      WHERE 5 * i >= 4 * (sa.c + sb.c - i)
    ),
    sym AS MATERIALIZED (
      SELECT id_a AS a, id_b AS b FROM pr
      UNION ALL
      SELECT id_b, id_a FROM pr
    ),
    reach(a, b) AS (
      SELECT a, b FROM sym
      UNION
      SELECT r.a, s.b FROM reach r JOIN sym s ON r.b = s.a
    ),
    lab AS (SELECT a AS node, least(min(b), a) AS label FROM reach GROUP BY a)
    SELECT doc_id FROM documents
    WHERE doc_id NOT IN (SELECT node FROM lab WHERE label < node)
    ORDER BY doc_id
    """,
)
def near_dedup_keep_first(sf_dir: str):
    """Training-data near-dedup: cluster near-dup edges (tau=0.8) with
    union-find and keep one representative (min id) per cluster plus all
    unclustered docs — the doc list a pipeline would train on."""
    ds = _docs_as_pages(sf_dir)
    edges = minhash.near_dup_edges(ds, minhash.MinHashConfig())
    labels = cluster.cluster_edges(edges)
    drop = {u for u, c in labels.items() if u != c}

    def keep(batch: pa.Table) -> pa.Table:
        ids = batch["url"].to_pylist()
        mask = pa.array([u not in drop for u in ids])
        return batch.filter(mask)

    kept = ds.map_batches(keep, batch_format="pyarrow").select_columns(["url"])
    rows = sorted(int(r["url"]) for r in kept.take_all())
    return pa.table({"doc_id": pa.array(rows, type=pa.int64())})


@query(
    "near_dedup_keep_best",
    # Same cluster base as near_dedup_keep_first; the kept representative
    # is the member with the MOST whitespace tokens (ties -> min doc_id)
    # — the "keep the longest/best version" curation policy, which only
    # differs from keep-first when near-dup members have unequal length.
    r"""
    WITH RECURSIVE
    norm AS (
      SELECT doc_id, trim(regexp_replace(lower(text), '\s+', ' ', 'g')) AS t
      FROM documents
    ),
    sh AS MATERIALIZED (
      SELECT DISTINCT doc_id, substr(t, i, 5) AS s
      FROM norm, LATERAL (SELECT unnest(generate_series(1, strlen(t) - 4)) AS i)
      WHERE strlen(t) >= 5
    ),
    sizes AS (SELECT doc_id, count(*) AS c FROM sh GROUP BY doc_id),
    inter AS (
      SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS i
      FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
      GROUP BY 1, 2
    ),
    pr AS MATERIALIZED (
      SELECT id_a, id_b
      FROM inter
      JOIN sizes sa ON sa.doc_id = inter.id_a
      JOIN sizes sb ON sb.doc_id = inter.id_b
      WHERE 5 * i >= 4 * (sa.c + sb.c - i)
    ),
    sym AS MATERIALIZED (
      SELECT id_a AS a, id_b AS b FROM pr
      UNION ALL
      SELECT id_b, id_a FROM pr
    ),
    reach(a, b) AS (
      SELECT a, b FROM sym
      UNION
      SELECT r.a, s.b FROM reach r JOIN sym s ON r.b = s.a
    ),
    lab AS (SELECT a AS node, least(min(b), a) AS label FROM reach GROUP BY a),
    scored AS (
      SELECT l.label, d.doc_id,
             length(regexp_extract_all(d.text, '\S+')) AS ntok
      FROM lab l JOIN documents d ON d.doc_id = l.node
    ),
    best AS (
      SELECT doc_id, row_number() OVER (
        PARTITION BY label ORDER BY ntok DESC, doc_id
      ) AS rn FROM scored
    )
    SELECT doc_id FROM documents WHERE doc_id NOT IN (SELECT node FROM lab)
    UNION ALL
    SELECT doc_id FROM best WHERE rn = 1
    ORDER BY doc_id
    """,
)
def near_dedup_keep_best(sf_dir: str):
    """Near-dedup keeping the BEST member per cluster — the curation
    policy a training pipeline actually wants (keep the longest version
    of a boilerplate-trimmed page, not whichever crawled first). Best =
    max whitespace-token count, ties broken by min doc_id; unclustered
    docs always survive. Token counts are computed only for clustered
    docs (a narrow broadcast-filtered pass bounded by cluster volume)."""
    from doppel_ray.functions import analysis as A

    ds = _docs_as_pages(sf_dir)
    edges = minhash.near_dup_edges(ds, minhash.MinHashConfig())
    labels = cluster.cluster_edges(edges)
    clustered = set(labels)

    def toks(batch: pa.Table) -> pa.Table:
        mask = pa.array([u in clustered for u in batch["url"].to_pylist()])
        sub = batch.filter(mask)
        return pa.table(
            {
                "url": sub["url"],
                "ntok": pa.array(A.token_counts(sub["text"])),
            }
        )

    best: dict[str, tuple] = {}
    for r in ds.map_batches(toks, batch_format="pyarrow").take_all():
        lab = labels[r["url"]]
        key = (-r["ntok"], r["url"])
        if lab not in best or key < best[lab]:
            best[lab] = key
    keep_clustered = {u for _, u in best.values()}

    def keep(batch: pa.Table) -> pa.Table:
        mask = pa.array(
            [
                u not in clustered or u in keep_clustered
                for u in batch["url"].to_pylist()
            ]
        )
        return batch.filter(mask)

    kept = ds.map_batches(keep, batch_format="pyarrow").select_columns(["url"])
    rows = sorted(int(r["url"]) for r in kept.take_all())
    return pa.table({"doc_id": pa.array(rows, type=pa.int64())})


@query(
    "curation_funnel",
    # End-to-end curation funnel: quality gate (same integer rule as
    # quality_filter_count) -> exact keep-first -> near keep-first
    # (same exact-Jaccard base + transitive closure as
    # near_dedup_keep_first, run over the exact survivors). Running the
    # near stage AFTER exact dedup is count-equivalent to running it on
    # the full quality set: an exact duplicate has the identical shingle
    # set as its kept twin, so removing it can't disconnect a cluster,
    # and each cluster's min id is always an exact survivor.
    rf"""
    WITH RECURSIVE
    q AS MATERIALIZED (
      SELECT doc_id, text FROM documents
      WHERE length(regexp_extract_all(text, '\S+')) >= 10
        AND 10 * length(regexp_extract_all(text, '[^\w\s]')) <= length(text)
    ),
    ex AS MATERIALIZED (
      SELECT min(doc_id) AS doc_id, text FROM q GROUP BY text
    ),
    norm AS (
      SELECT doc_id, trim(regexp_replace(lower(text), '\s+', ' ', 'g')) AS t
      FROM ex
    ),
    sh AS MATERIALIZED (
      SELECT DISTINCT doc_id, substr(t, i, 5) AS s
      FROM norm, LATERAL (SELECT unnest(generate_series(1, strlen(t) - 4)) AS i)
      WHERE strlen(t) >= 5
    ),
    sizes AS (SELECT doc_id, count(*) AS c FROM sh GROUP BY doc_id),
    inter AS (
      SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS i
      FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
      GROUP BY 1, 2
    ),
    pr AS MATERIALIZED (
      SELECT id_a, id_b
      FROM inter
      JOIN sizes sa ON sa.doc_id = inter.id_a
      JOIN sizes sb ON sb.doc_id = inter.id_b
      WHERE 5 * i >= 4 * (sa.c + sb.c - i)
    ),
    sym AS MATERIALIZED (
      SELECT id_a AS a, id_b AS b FROM pr
      UNION ALL
      SELECT id_b, id_a FROM pr
    ),
    reach(a, b) AS (
      SELECT a, b FROM sym
      UNION
      SELECT r.a, s.b FROM reach r JOIN sym s ON r.b = s.a
    ),
    lab AS (SELECT a AS node, least(min(b), a) AS label FROM reach GROUP BY a)
    SELECT 0::BIGINT AS stage_idx, 'input' AS stage,
           (SELECT count(*) FROM documents)::BIGINT AS n_docs
    UNION ALL
    SELECT 1::BIGINT, 'quality', (SELECT count(*) FROM q)::BIGINT
    UNION ALL
    SELECT 2::BIGINT, 'exact_dedup', (SELECT count(*) FROM ex)::BIGINT
    UNION ALL
    SELECT 3::BIGINT, 'near_dedup',
           (SELECT count(*) FROM ex)::BIGINT
           - (SELECT count(*) FROM lab WHERE label < node)::BIGINT
    """,
)
def curation_funnel(sf_dir: str):
    """The flagship composite: how many documents survive each stage of
    the standard web-corpus curation recipe — quality gate, exact
    keep-first dedup, near keep-first dedup. One row per stage with the
    surviving-doc count, the number every curation run reports.

    Scale shape: each stage consumer independently STREAMS the cheap
    vectorized quality filter (recompute-over-materialize — the filter
    is one RE2 pass, while materializing would park the whole filtered
    corpus in the object store); the exact count is a narrow
    hash-groupby; the near stage is the production MinHash path, whose
    internal exact-dup pre-prune makes running it on the quality set
    count-equivalent to running it on the exact survivors (see oracle
    comment)."""
    from doppel_ray.functions import analysis as A
    from doppel_ray.stages import exact

    ds = read_documents(sf_dir, columns=["doc_id", "text"])
    n_input = ds.count()

    def qfilter(batch: pa.Table) -> pa.Table:
        n_tok = A.token_counts(batch["text"], A.WS_TOKEN_RE)
        n_punct = A.token_counts(batch["text"], A.PUNCT_RE)
        import pyarrow.compute as pc

        n_chars = (
            pc.utf8_length(batch["text"].combine_chunks())
            .fill_null(0)
            .to_numpy(zero_copy_only=False)
            .astype(np.int64)
        )
        return batch.filter(pa.array((n_tok >= 10) & (10 * n_punct <= n_chars)))

    q_ds = ds.map_batches(qfilter, batch_format="pyarrow")
    n_quality = q_ds.count()
    n_exact = exact.dedup_keep_first(q_ds, id_col="doc_id").count()

    def to_pages(batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_pylist()
        return pa.table(
            {
                "url": pa.array([f"{i:012d}" for i in ids]),
                "text": batch["text"],
            }
        )

    pages = q_ds.map_batches(to_pages, batch_format="pyarrow")
    edges = minhash.near_dup_edges(pages, minhash.MinHashConfig())
    labels = cluster.cluster_edges(edges)
    n_drop = sum(1 for u, c in labels.items() if u != c)
    n_near = n_quality - n_drop

    return pa.table(
        {
            "stage_idx": pa.array([0, 1, 2, 3], type=pa.int64()),
            "stage": pa.array(
                ["input", "quality", "exact_dedup", "near_dedup"]
            ),
            "n_docs": pa.array(
                [n_input, n_quality, n_exact, n_near], type=pa.int64()
            ),
        }
    )


@query(
    "incremental_near_dedup",
    # Same exact-Jaccard rule (DISTINCT 5-char shingles of the normalized
    # text, 5i >= 4u integer arithmetic) as the minhash_near_dup oracle,
    # restricted to cross-corpus pairs: odd doc_ids play the NEW crawl
    # batch, even the existing index; survivors are new docs with no
    # index near-dup. LSH-miss analysis identical to minhash_near_dup
    # (verification is exact Jaccard; recall >= 0.99 pinned in tests).
    r"""
    WITH norm AS (
      SELECT doc_id, trim(regexp_replace(lower(text), '\s+', ' ', 'g')) AS t
      FROM documents
    ),
    sh AS (
      SELECT DISTINCT doc_id, substr(t, i, 5) AS s
      FROM norm, LATERAL (SELECT unnest(generate_series(1, strlen(t) - 4)) AS i)
      WHERE strlen(t) >= 5
    ),
    sizes AS (SELECT doc_id, count(*) AS c FROM sh GROUP BY doc_id),
    inter AS (
      SELECT a.doc_id AS id_n, b.doc_id AS id_i, count(*) AS i
      FROM sh a JOIN sh b ON a.s = b.s
      WHERE a.doc_id % 2 = 1 AND b.doc_id % 2 = 0
      GROUP BY 1, 2
    ),
    hits AS (
      SELECT DISTINCT id_n
      FROM inter
      JOIN sizes sa ON sa.doc_id = inter.id_n
      JOIN sizes sb ON sb.doc_id = inter.id_i
      WHERE 5 * i >= 4 * (sa.c + sb.c - i)
    )
    SELECT doc_id FROM documents
    WHERE doc_id % 2 = 1 AND doc_id NOT IN (SELECT id_n FROM hits)
    """,
)
def incremental_near_dedup(sf_dir: str):
    """Incremental near-dedup (stages/incremental.py): new-batch docs
    surviving MinHash/LSH + exact-Jaccard dedup against the index half
    of the corpus."""
    import pyarrow.compute as pc

    from doppel_ray.stages import incremental

    ds = read_documents(sf_dir, columns=["doc_id", "text"])

    def side(parity: int):
        def fn(batch: pa.Table) -> pa.Table:
            return batch.filter(
                pc.equal(pc.bit_wise_and(batch["doc_id"], 1), parity)
            )

        return fn

    new_ds = ds.map_batches(side(1), batch_format="pyarrow")
    index_ds = ds.map_batches(side(0), batch_format="pyarrow")
    out = incremental.near_dedup_against_index(
        new_ds, index_ds, minhash.MinHashConfig()
    )
    return finalize(out, pa.schema([("doc_id", pa.int64())]))


@query("embedding_clusters")  # rows-only: k-means, no SQL analog
def embedding_clusters(sf_dir: str):
    """Distributed k-means cluster profile of the embeddings table:
    deterministic hash-sampled Lloyd training (semdedup.train_centroids,
    layout-invariant), broadcast-centroid assignment per batch, then one
    narrow (cluster, label) count groupby; the per-cluster majority
    label + purity numerator come off the BOUNDED k x |labels| aggregate.
    Rows = clusters (k), so the driver's rows-only check pins the
    cluster count; recovery of planted well-separated blobs is pinned in
    tests/test_clusters.py."""
    import numpy as np
    import ray

    from ray.data.aggregate import Count

    from doppel_ray.sources.parquet import read_embeddings
    from doppel_ray.stages.ann import _normalize, batch_matrix
    from doppel_ray.stages.semdedup import SemDeDupConfig, train_centroids
    from doppel_ray.stages.util import cached_get

    ds = read_embeddings(sf_dir, columns=["vec_id", "embedding", "label"])
    cfg = SemDeDupConfig(
        n_clusters=10, train_num=1000, train_den=1000, kmeans_iters=15
    )
    cent = train_centroids(ds, cfg)
    ref = ray.put(cent)

    def assign(batch: pa.Table) -> pa.Table:
        c = cached_get(ref)
        x = _normalize(batch_matrix(batch["embedding"]))
        a = (
            np.argmax(x @ c.T, axis=1).astype(np.int64)
            if x.shape[0]
            else np.array([], dtype=np.int64)
        )
        return pa.table(
            {
                "cluster": pa.array(a, type=pa.int64()),
                "label": batch["label"].cast(pa.int64()),
            }
        )

    agg = finalize(
        ds.map_batches(assign, batch_format="pyarrow")
        .groupby(["cluster", "label"])
        .aggregate(Count(alias_name="n")),
        pa.schema(
            [("cluster", pa.int64()), ("label", pa.int64()), ("n", pa.int64())]
        ),
    )
    df = agg.to_pandas().sort_values(["cluster", "n", "label"])
    top = df.groupby("cluster").tail(1)
    tot = df.groupby("cluster")["n"].sum()
    return pa.table(
        {
            "cluster": pa.array(top["cluster"].to_numpy(), type=pa.int64()),
            "n": pa.array(
                tot.loc[top["cluster"]].to_numpy().astype("int64"),
                type=pa.int64(),
            ),
            "majority_label": pa.array(
                top["label"].to_numpy().astype("int64"), type=pa.int64()
            ),
            "n_majority": pa.array(
                top["n"].to_numpy().astype("int64"), type=pa.int64()
            ),
        }
    )


@query(
    "embedding_decontam",
    # Float-safety: cosine margins to tau=0.4 are 1.3e-4 (sf0.01) and
    # 9.9e-6 (sf0.1) — ~50-600x DuckDB's float32 accumulation noise
    # (~2e-7 at 64 dims), so the match COUNTS are oracle-stable; the
    # similarity itself stays out of the compared columns.
    """
    SELECT x.vec_id AS vec_id, count(*) AS n_matches
    FROM embeddings x JOIN embeddings e ON e.vec_id < 32
    WHERE x.vec_id >= 32
      AND list_cosine_similarity(x.embedding, e.embedding) >= 0.4
    GROUP BY 1
    """,
)
def embedding_decontam(sf_dir: str):
    """Semantic decontamination: corpus embeddings flagged when cosine
    to ANY eval-set embedding (vec_id < 32, broadcast once) >= 0.4 —
    the paraphrase-robust complement to n-gram decontamination
    (stages/decontam.py:embedding_decontam_counts; zero shuffles)."""
    import numpy as np

    from doppel_ray.sources.parquet import read_embeddings
    from doppel_ray.stages.decontam import embedding_decontam_counts

    ds = read_embeddings(sf_dir, columns=["vec_id", "embedding"])
    ev_rows = ds.filter(expr="vec_id < 32").take_all()
    ev_rows.sort(key=lambda r: r["vec_id"])
    ev = np.array([r["embedding"] for r in ev_rows], dtype=np.float64)
    corpus = ds.filter(expr="vec_id >= 32")
    out = embedding_decontam_counts(corpus, ev, threshold=0.4)
    return finalize(
        out,
        pa.schema([("vec_id", pa.int64()), ("n_matches", pa.int64())]),
    )


@query(
    "tiered_dedup",
    # The tier-attribution oracle: window mins give the exact and
    # normalized tiers; the near tier reuses near_dedup_keep_first's
    # proven shingle/Jaccard/transitive-closure CTE chain verbatim
    # (components over ALL docs — identical normalized texts share
    # shingle sets, so every component min is itself a kept doc and
    # the CASE ladder resolves eliminated docs at their earlier tier).
    r"""
    WITH RECURSIVE
    base AS (
      SELECT doc_id,
             min(doc_id) OVER (PARTITION BY text) AS exact_min,
             trim(regexp_replace(lower(text), '\s+', ' ', 'g')) AS t
      FROM documents
    ),
    nm AS (
      SELECT doc_id, exact_min,
             min(doc_id) OVER (PARTITION BY t) AS norm_min, t
      FROM base
    ),
    sh AS MATERIALIZED (
      SELECT DISTINCT doc_id, substr(t, i, 5) AS s
      FROM nm, LATERAL (SELECT unnest(generate_series(1, strlen(t) - 4)) AS i)
      WHERE strlen(t) >= 5
    ),
    sizes AS (SELECT doc_id, count(*) AS c FROM sh GROUP BY doc_id),
    inter AS (
      SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS i
      FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
      GROUP BY 1, 2
    ),
    pr AS MATERIALIZED (
      SELECT id_a, id_b
      FROM inter
      JOIN sizes sa ON sa.doc_id = inter.id_a
      JOIN sizes sb ON sb.doc_id = inter.id_b
      WHERE 5 * i >= 4 * (sa.c + sb.c - i)
    ),
    sym AS MATERIALIZED (
      SELECT id_a AS a, id_b AS b FROM pr
      UNION ALL
      SELECT id_b, id_a FROM pr
    ),
    reach(a, b) AS (
      SELECT a, b FROM sym
      UNION
      SELECT r.a, s.b FROM reach r JOIN sym s ON r.b = s.a
    ),
    lab AS (SELECT a AS node, least(min(b), a) AS label FROM reach GROUP BY a)
    SELECT nm.doc_id,
           CASE WHEN nm.doc_id > nm.exact_min THEN 'exact'
                WHEN nm.doc_id > nm.norm_min THEN 'normalized'
                WHEN lab.label IS NOT NULL AND lab.label < nm.doc_id THEN 'near'
                ELSE 'kept' END AS tier
    FROM nm LEFT JOIN lab ON lab.node = nm.doc_id
    ORDER BY doc_id
    """,
)
def tiered_dedup(sf_dir: str):
    """THE namesake pipeline: every document attributed to the first
    dedup tier that eliminates it (exact -> normalized -> near -> kept)
    — the per-tier dedup ledger a 100 TB curation run publishes
    (stages/tiered.py: two narrow key shuffles + the proven near-dedup
    machinery; payloads never shuffle)."""
    from doppel_ray.stages import tiered

    ds = read_documents(sf_dir, columns=["doc_id", "text"])
    out = tiered.tiered_dedup(ds)
    return finalize(
        out,
        pa.schema([("doc_id", pa.int64()), ("tier", pa.string())]),
    )
