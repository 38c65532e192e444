"""Similarity-search queries (SURVEY §2.10 X2) over the embeddings table.

The DuckDB oracles replicate the engine's sequential-left-fold double
arithmetic (list_reduce mirrors zip_with+aggregate element order), so
cosine scores are bit-equal and the top-k sets match exactly.
"""

from __future__ import annotations

from etl_notifier_pipeline_spark.caching import tracked_persist
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from etl_notifier_pipeline_spark.catalog import load_table
from etl_notifier_pipeline_spark.extensions import similarity as S
from etl_notifier_pipeline_spark.plans.registry import register

# DuckDB twins of similarity.dot / similarity.norm: pairwise products
# first (so the fold seed is the first product, matching Spark's 0.0
# seed + first addition), then a sequential double fold.
_DOT = (
    "list_reduce(list_transform(range(1, 65), "
    "i -> {a}[i]::DOUBLE * {b}[i]::DOUBLE), (x, y) -> x + y)"
)
_NORM = (
    "sqrt(list_reduce(list_transform(range(1, 65), "
    "i -> {a}[i]::DOUBLE * {a}[i]::DOUBLE), (x, y) -> x + y))"
)
_COS = f"({_DOT} / ({_NORM.format(a='{a}')} * {_NORM.format(a='{b}')}))"


@register(
    "s01_cosine_topk",
    category="similarity",
    oracle=f"""
SELECT query_id, neighbor_id, cos_sim, rank FROM (
  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
         {_COS.format(a='q.embedding', b='c.embedding')} AS cos_sim,
         ROW_NUMBER() OVER (
           PARTITION BY q.vec_id
           ORDER BY {_COS.format(a='q.embedding', b='c.embedding')} DESC,
                    c.vec_id) AS rank
  FROM embeddings q, embeddings c
  WHERE q.vec_id < 8 AND c.vec_id <> q.vec_id
) WHERE rank <= 5
""",
)
def s01_cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Brute-force cosine top-5 for 8 query vectors: broadcast the
    query set, scan the corpus once, rank per query — the exact
    baseline every ANN variant is measured against."""
    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 8)
    return S.topk_cosine(emb, queries, k=5)


# Blocked near-dup pair SQL, reusable (s02 emits it; s05 clusters it).
_NEAR_DUP_SQL = f"""
SELECT l.label AS block, l.vec_id AS id_a, r.vec_id AS id_b,
       {_COS.format(a='l.embedding', b='r.embedding')} AS cos_sim
FROM embeddings l JOIN embeddings r ON l.label = r.label
WHERE l.vec_id < r.vec_id
  AND {_COS.format(a='l.embedding', b='r.embedding')} >= 0.4
"""


@register(
    "s02_blocked_near_dup",
    category="similarity",
    oracle=_NEAR_DUP_SQL,
)
def s02_blocked_near_dup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding near-dup pairs within a blocking key (label): the
    |block|²-not-n² candidate pattern for embedding-cosine dedup."""
    emb = load_table(spark, sf_dir, "embeddings")
    return S.blocked_near_dup_pairs(emb, block_col="label", threshold=0.4)


@register(
    "s06_label_centroids",
    category="similarity",
    oracle="""
SELECT label, pos,
       CAST(qsum AS DOUBLE) / (n * 1000000) AS centroid_val,
       n AS n_vectors
FROM (
  SELECT label, pos, SUM(q) AS qsum, COUNT(*) AS n
  FROM (
    SELECT label,
           unnest(range(0, len(embedding))) AS pos,
           unnest(list_transform(embedding,
             e -> CAST(round(e::DOUBLE * 1000000) AS BIGINT))) AS q
    FROM embeddings
  )
  GROUP BY label, pos
)
""",
)
def s06_label_centroids(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-label embedding centroids (the cluster-profile aggregate an
    ANN index build or drift monitor needs): elementwise mean of the
    vectors in each label group.

    Determinism: floats are quantized to micro-units (round(x*1e6) as
    int64) BEFORE summing — integer sums are order-independent, so the
    shuffle can't move a bit, and both engines divide the same exact
    integer by the same exact count. Scale shape: posexplode ->
    one partial-aggregated groupBy on (label, pos) — the shuffle
    carries (int, int, int64) rows, never vectors; 100 TB of
    embeddings reduces map-side to |labels| x dim rows."""
    emb = load_table(spark, sf_dir, "embeddings")
    q = F.round(F.col("e").cast("double") * 1_000_000).cast("bigint")
    return (
        emb.select("label", F.posexplode("embedding").alias("pos", "e"))
        .groupBy("label", "pos")
        .agg(F.sum(q).alias("qsum"), F.count(F.lit(1)).alias("n"))
        .select(
            "label",
            "pos",
            (F.col("qsum").cast("double") / (F.col("n") * 1_000_000)).alias(
                "centroid_val"
            ),
            F.col("n").alias("n_vectors"),
        )
    )


@register(
    "s05_embedding_clusters",
    category="similarity",
    oracle=f"""
WITH RECURSIVE pairs AS ({_NEAR_DUP_SQL}),
edges AS (
  SELECT id_a AS u, id_b AS v FROM pairs
  UNION
  SELECT id_b AS u, id_a AS v FROM pairs
),
nodes AS (SELECT DISTINCT u FROM edges),
reach AS (
  SELECT u, u AS v FROM nodes
  UNION
  SELECT r.u, e.v FROM reach r JOIN edges e ON r.v = e.u
)
SELECT u AS vec_id, MIN(v) AS cluster_id FROM reach GROUP BY u
""",
)
def s05_embedding_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding near-dup clusters: connected components over the
    blocked-cosine pair graph (cluster_id = min member) — the same
    canonical-representative step as d06, driven by vector similarity
    instead of shingle overlap. Value-checked via recursive CTE."""
    from etl_notifier_pipeline_spark.extensions.dedup import dedup_clusters

    emb = load_table(spark, sf_dir, "embeddings")
    pairs = S.blocked_near_dup_pairs(emb, block_col="label", threshold=0.4)
    return dedup_clusters(pairs, "id_a", "id_b").select(
        F.col("doc_id").alias("vec_id"), "cluster_id"
    )


@register(
    "d08_semantic_keep_list",
    category="dedup",
    oracle=f"""
WITH RECURSIVE pairs AS ({_NEAR_DUP_SQL}),
edges AS (
  SELECT id_a AS u, id_b AS v FROM pairs
  UNION
  SELECT id_b AS u, id_a AS v FROM pairs
),
nodes AS (SELECT DISTINCT u FROM edges),
reach AS (
  SELECT u, u AS v FROM nodes
  UNION
  SELECT r.u, e.v FROM reach r JOIN edges e ON r.v = e.u
),
clusters AS (SELECT u AS vec_id, MIN(v) AS cluster_id FROM reach GROUP BY u)
SELECT e.vec_id,
       COALESCE(c.cluster_id, e.vec_id) AS cluster_id,
       (c.cluster_id IS NULL OR c.cluster_id = e.vec_id) AS keep
FROM embeddings e LEFT JOIN clusters c ON c.vec_id = e.vec_id
""",
)
def d08_semantic_keep_list(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup-style keep list: near-duplicate embedding clusters
    (the s05 connected components) reduced to ONE canonical
    representative each (the min-id member = the cluster label
    itself); singletons keep themselves. The downstream corpus filter
    is ``WHERE keep`` — this closes the semantic-dedup loop from pair
    generation through cluster closure to the final survivor set.

    Scale shape: the pair graph + label propagation never touch the
    full corpus (see dedup_clusters); the final decoration is one
    LEFT join of the corpus against the |clustered-vectors| map,
    broadcast when small, shuffle-on-key otherwise. keep needs no
    per-cluster argmin pass: min-label propagation already makes the
    representative's OWN id the cluster label.
    """
    from etl_notifier_pipeline_spark.extensions.dedup import dedup_clusters

    emb = load_table(spark, sf_dir, "embeddings")
    pairs = S.blocked_near_dup_pairs(emb, block_col="label", threshold=0.4)
    clusters = dedup_clusters(pairs, "id_a", "id_b").select(
        F.col("doc_id").alias("vec_id"), "cluster_id"
    )
    return (
        emb.select("vec_id")
        .join(clusters, "vec_id", "left")
        .select(
            "vec_id",
            F.coalesce("cluster_id", "vec_id").alias("cluster_id"),
            (
                F.col("cluster_id").isNull()
                | (F.col("cluster_id") == F.col("vec_id"))
            ).alias("keep"),
        )
    )


@register(
    "s07_cluster_cohesion",
    category="similarity",
    oracle="""
WITH ex AS (
  SELECT vec_id, label,
         unnest(range(0, len(embedding))) AS pos,
         unnest(list_transform(embedding, e -> e::DOUBLE)) AS e
  FROM embeddings
),
cent AS (
  SELECT label, pos,
         CAST(SUM(CAST(round(e * 1000000) AS BIGINT)) AS DOUBLE)
           / (COUNT(*) * 1000000) AS c
  FROM ex GROUP BY label, pos
),
cnorm AS (
  SELECT label,
         SUM(CAST(round(c * c * 1000000000000.0) AS BIGINT)) AS cq
  FROM cent GROUP BY label
),
pv AS (
  SELECT ex.vec_id, ex.label,
         SUM(CAST(round(ex.e * cent.c * 1000000000000.0) AS BIGINT)) AS dq,
         SUM(CAST(round(ex.e * ex.e * 1000000000000.0) AS BIGINT)) AS vq
  FROM ex JOIN cent ON ex.label = cent.label AND ex.pos = cent.pos
  GROUP BY ex.vec_id, ex.label
),
cosv AS (
  SELECT pv.label,
         (dq / 1000000000000.0)
           / (sqrt(vq / 1000000000000.0) * sqrt(cq / 1000000000000.0))
           AS cos
  FROM pv JOIN cnorm ON pv.label = cnorm.label
)
SELECT label,
       COUNT(*) AS n_vectors,
       CAST(SUM(CAST(round(cos * 1000000) AS BIGINT)) AS DOUBLE)
         / (COUNT(*) * 1000000) AS cohesion
FROM cosv GROUP BY label
""",
)
def s07_cluster_cohesion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cluster-cohesion audit: per label, the mean cosine similarity of
    member vectors to their label centroid — the drift/compactness
    monitor an ANN index build runs after clustering (low cohesion =
    the label is not a tight cluster). Completes the clustering
    toolkit: s06 centroids, s05 closure, d08 keep list, s07 audit.

    Determinism: every cross-row reduction is an INTEGER sum — centroid
    elements from micro-quantized sums (s06's trick), dot products and
    squared norms pico-quantized per element, the final mean from
    micro-quantized cosines. Doubles only flow through per-row
    deterministic ops (multiply, sqrt, divide) shared bit-for-bit by
    both engines.

    Scale shape: two corpus passes — one builds the (label, pos)
    centroid aggregate (map-side combined, persisted: |labels| x dim
    rows feed both the norm derivation and the join), one scores
    members against the BROADCAST centroids; the per-vector aggregate
    carries (id, label, int64 x2) rows. 100 TB of embeddings never
    shuffles a vector."""
    emb = load_table(spark, sf_dir, "embeddings")
    PICO = F.lit(1_000_000_000_000.0)
    ex = emb.select(
        "vec_id",
        "label",
        F.posexplode("embedding").alias("pos", "__e"),
    ).withColumn("e", F.col("__e").cast("double"))
    # persisted: |labels| x dim rows, consumed by cnorm AND the join —
    # without it Spark re-derives the centroid aggregate (and re-scans
    # the corpus) once per consumer
    cent = (
        ex.groupBy("label", "pos")
        .agg(
            F.sum(F.round(F.col("e") * 1_000_000).cast("bigint")).alias("qs"),
            F.count(F.lit(1)).alias("n"),
        )
        .select(
            "label",
            "pos",
            (F.col("qs").cast("double") / (F.col("n") * 1_000_000)).alias("c"),
        )
    )
    cent = tracked_persist(cent)
    cnorm = cent.groupBy("label").agg(
        F.sum(F.round(F.col("c") * F.col("c") * PICO).cast("bigint")).alias("cq")
    )
    pv = (
        ex.join(F.broadcast(cent), ["label", "pos"])
        .groupBy("vec_id", "label")
        .agg(
            F.sum(
                F.round(F.col("e") * F.col("c") * PICO).cast("bigint")
            ).alias("dq"),
            F.sum(
                F.round(F.col("e") * F.col("e") * PICO).cast("bigint")
            ).alias("vq"),
        )
    )
    cos = (F.col("dq") / PICO) / (
        F.sqrt(F.col("vq") / PICO) * F.sqrt(F.col("cq") / PICO)
    )
    return (
        pv.join(F.broadcast(cnorm), "label")
        .select("label", cos.alias("cos"))
        .groupBy("label")
        .agg(
            F.count(F.lit(1)).alias("n_vectors"),
            F.sum(F.round(F.col("cos") * 1_000_000).cast("bigint")).alias("sq"),
        )
        .select(
            "label",
            "n_vectors",
            (F.col("sq").cast("double") / (F.col("n_vectors") * 1_000_000)).alias(
                "cohesion"
            ),
        )
    )


@register("s08_pq_topk", category="similarity")
def s08_pq_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate top-5 via product quantization + asymmetric distance
    (m=8 subspaces x 16 codes, 2 distributed Lloyd steps, exact rerank
    of the 4k best ADC candidates) — the memory-compression ANN path:
    at 100 TB the float corpus becomes an 8-byte-per-vector code table
    and the per-pair cost is 8 lookups + adds in whole-stage codegen.
    Approximate by construction -> rows-only driver check; the
    equivalence + recall property tests in tests/test_similarity.py
    are the value gate."""
    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 8)
    return S.pq_topk(emb, queries, k=5)


@register("s14_ivfpq_topk", category="similarity")
def s14_ivfpq_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVFADC approximate top-5 (Jegou et al. 2011): sqrt-n coarse
    cells, product quantization of the RESIDUALS, per-cell ADC scan of
    n_cells/8 probed cells, exact rerank of the best candidates — the
    composition that survives where flat PQ degenerates (measured at
    2 M vectors: flat-PQ recall@5 0.04, IVFADC 0.65;
    ANN_RECALL_sf100.json). The corpus is never exact-scanned and
    never shuffled: candidates resolve through a broadcast equi-join
    on the cell key. Approximate by construction -> rows-only driver
    check; recall property test is the value gate."""
    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 8)
    return S.ivfpq_topk(emb, queries, k=5, n_codes=16)


@register(
    "s10_radius_search",
    category="similarity",
    oracle=f"""
SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
       {_COS.format(a='q.embedding', b='c.embedding')} AS cos_sim
FROM embeddings q, embeddings c
WHERE q.vec_id < 8 AND c.vec_id <> q.vec_id
  AND {_COS.format(a='q.embedding', b='c.embedding')} >= 0.4
""",
)
def s10_radius_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cosine radius search (all neighbors >= 0.4) for 8 query
    vectors: the unbounded-k retrieval primitive — threshold applied
    inside the scan stage, no ranking window."""
    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 8)
    return S.radius_search(emb, queries, threshold=0.4)


# 16-dim prefix twins of _DOT/_NORM (same fold-order doctrine).
_PDOT = (
    "list_reduce(list_transform(range(1, 17), "
    "i -> {a}[i]::DOUBLE * {b}[i]::DOUBLE), (x, y) -> x + y)"
)
_PNORM = (
    "sqrt(list_reduce(list_transform(range(1, 17), "
    "i -> {a}[i]::DOUBLE * {a}[i]::DOUBLE), (x, y) -> x + y))"
)
_PCOS = f"({_PDOT} / ({_PNORM.format(a='{a}')} * {_PNORM.format(a='{b}')}))"


@register(
    "s11_prefix_rerank_topk",
    category="similarity",
    oracle=f"""
WITH cand AS (
  SELECT query_id, neighbor_id FROM (
    SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
           ROW_NUMBER() OVER (
             PARTITION BY q.vec_id
             ORDER BY {_PCOS.format(a='q.embedding', b='c.embedding')} DESC,
                      c.vec_id) AS pre_rank
    FROM embeddings q, embeddings c
    WHERE q.vec_id < 8 AND c.vec_id <> q.vec_id
  ) WHERE pre_rank <= 20
)
SELECT query_id, neighbor_id, cos_sim, rank FROM (
  SELECT cand.query_id, cand.neighbor_id,
         {_COS.format(a='q.embedding', b='c.embedding')} AS cos_sim,
         ROW_NUMBER() OVER (
           PARTITION BY cand.query_id
           ORDER BY {_COS.format(a='q.embedding', b='c.embedding')} DESC,
                    cand.neighbor_id) AS rank
  FROM cand
  JOIN embeddings q ON q.vec_id = cand.query_id
  JOIN embeddings c ON c.vec_id = cand.neighbor_id
) WHERE rank <= 5
""",
)
def s11_prefix_rerank_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Matryoshka-style two-stage ANN: candidates ranked by cosine
    over the FIRST 16 dims (a quarter of the fold cost), top-20 kept
    per query, exact 64-dim rerank to top-5. Unlike LSH/IVF the whole
    operator is exact arithmetic over fixed slices, so the
    approximate-search SHAPE gets a full value oracle."""
    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 8)
    return S.prefix_rerank_topk(emb, queries, k=5, prefix_dim=16, cand_mult=4)


S12_LABELS = (2, 5, 7)


@register(
    "s12_filtered_cosine_topk",
    category="similarity",
    oracle=f"""
SELECT query_id, neighbor_id, cos_sim, rank FROM (
  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
         {_COS.format(a='q.embedding', b='c.embedding')} AS cos_sim,
         ROW_NUMBER() OVER (
           PARTITION BY q.vec_id
           ORDER BY {_COS.format(a='q.embedding', b='c.embedding')} DESC,
                    c.vec_id) AS rank
  FROM embeddings q, embeddings c
  WHERE q.vec_id < 8 AND c.vec_id <> q.vec_id
    AND c.label IN {S12_LABELS}
) WHERE rank <= 5
""",
)
def s12_filtered_cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Filtered vector search — the canonical retrieval query shape:
    top-k by cosine among only the corpus rows passing a metadata
    predicate (label IN (2,5,7); think language/license/source filters
    on a training corpus). The filter composes BELOW the broadcast
    scoring join, so Catalyst pushes it into the parquet scan
    (PushedFilters: In(label, ...) — asserted by a plan-shape test)
    and the scored set is ~30% of the corpus, not 100% post-filtered:
    at 100 TB, filtered search costs the selectivity, not the corpus.
    Pre-filtering also keeps top-k semantics right (k survivors
    INSIDE the filter, not filtered leftovers of an unfiltered
    top-k)."""
    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 8)
    return S.topk_cosine(
        emb.filter(F.col("label").isin(*S12_LABELS)), queries, k=5
    )


S13_BATCH_MOD = 12
S13_THRESHOLD = 0.85


@register(
    "s13_incremental_semantic_dedup",
    category="similarity",
    oracle=f"""
WITH b AS (
  SELECT vec_id, embedding FROM embeddings WHERE vec_id % {S13_BATCH_MOD} = 0
),
h AS (
  SELECT vec_id, embedding FROM embeddings WHERE vec_id % {S13_BATCH_MOD} <> 0
),
scored AS (
  SELECT b.vec_id AS b_id, h.vec_id AS h_id,
         {_COS.format(a='b.embedding', b='h.embedding')} AS cos
  FROM b, h
),
m AS (
  SELECT b_id, COUNT(*) AS n_matches,
         MIN(h_id ORDER BY cos DESC, h_id) AS best_match_id,
         MAX(cos) AS best_cos
  FROM scored WHERE cos >= {S13_THRESHOLD}
  GROUP BY b_id
)
SELECT b.vec_id,
       COALESCE(m.n_matches, 0) AS n_matches,
       m.best_match_id,
       m.best_cos,
       m.b_id IS NULL AS is_novel
FROM b LEFT JOIN m ON m.b_id = b.vec_id
""",
)
def s13_incremental_semantic_dedup(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Incremental EMBEDDING dedup — the vector analog of d13: a
    micro-batch of new vectors (1/12 slice) verdicted against the
    historical corpus by exact cosine (>= 0.85): match count, best
    historical match by (cos desc, id), novelty flag, one row per
    batch vector. The batch broadcasts; the corpus scans once — cost
    linear in the corpus per bounded ingest batch, and the exactness
    is what makes the operator value-checkable bit-for-bit (the
    IVF-blocked s09 machinery is the approximate valve for
    batch sizes past broadcast range)."""
    emb = load_table(spark, sf_dir, "embeddings")
    is_batch = (F.col("vec_id") % S13_BATCH_MOD) == 0
    return S.incremental_semantic_dedup(
        emb.filter(~is_batch), emb.filter(is_batch), threshold=S13_THRESHOLD
    )


@register(
    "s20_semantic_dedup_one_cell",
    category="similarity",
    oracle=f"""
WITH dropped AS (
  SELECT DISTINCT r.vec_id
  FROM embeddings l JOIN embeddings r ON l.vec_id < r.vec_id
  WHERE {_COS.format(a='l.embedding', b='r.embedding')} >= 0.4
)
SELECT e.vec_id, 0 AS cell
FROM embeddings e LEFT JOIN dropped d ON d.vec_id = e.vec_id
WHERE d.vec_id IS NULL
""",
)
def s20_semantic_dedup_one_cell(spark: SparkSession, sf_dir: str) -> DataFrame:
    """s09's oracle-paired degenerate twin (r11 verdict gap #2, the
    s15-s19 pattern): ``semantic_dedup`` pinned at the ONE-cell
    operating point, where the IVF blocking admits every pair and the
    survivor rule collapses to SQL — a vector survives iff no lower-id
    vector in the corpus is within the cosine threshold. The whole s09
    machinery is on the hook bit-for-bit: the seeded integer-
    accumulated quantizer, the cell assignment, the Arrow-batched
    blocked pair search, and the greedy lowest-id anti-join — a wrong
    centroid, a dropped pair, or a survivor-rule regression all flip
    rows. Threshold 0.4 drops 53 of 500 vectors at sf0.01 (the gate is
    non-vacuous); the nearest pair cosine sits 1.3e-4 from the
    threshold (9.8e-6 at sf0.1), ~10 orders above numpy-vs-fold
    summation noise, so the comparison can never flip on float order.
    s09 itself stays the scale operating point (sqrt-n cells)."""
    emb = load_table(spark, sf_dir, "embeddings")
    return S.semantic_dedup(emb, n_cells=1, threshold=0.4).select(
        "vec_id", F.col("cell").cast("int").alias("cell")
    )


# The exact brute-force top-5 for the first 8 query vectors — the
# shared oracle of every ANN family's degenerate-exact operating point
# (s15 IVF full probe; s21 LSH zero planes; s22 IVFADC full probe +
# corpus-wide shortlist; s23 PQ exhaustive rerank).
_EXACT_TOPK_SQL = f"""
SELECT query_id, neighbor_id, cos_sim, rank FROM (
  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
         {_COS.format(a='q.embedding', b='c.embedding')} AS cos_sim,
         ROW_NUMBER() OVER (
           PARTITION BY q.vec_id
           ORDER BY {_COS.format(a='q.embedding', b='c.embedding')} DESC,
                    c.vec_id) AS rank
  FROM embeddings q, embeddings c
  WHERE q.vec_id < 8 AND c.vec_id <> q.vec_id
) WHERE rank <= 5
"""


@register(
    "s21_lsh_exhaustive_serve",
    category="similarity",
    oracle=_EXACT_TOPK_SQL,
)
def s21_lsh_exhaustive_serve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """s03/LSH's oracle-paired degenerate twin (the s15 pattern): with
    ZERO hyperplanes every vector's sign pattern is empty, so the one
    table's single bucket admits the whole corpus and the serve path
    degenerates to exact search — build, (tbl, bkt) candidate join,
    cross-table OR-dedup, and the exact-cosine rank window must
    hash-equal brute force bit-for-bit. The recall tests cover the
    approximate plane/table operating points; THIS pins the LSH
    build/serve machinery itself to the exact baseline."""
    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 8)
    index, params = S.lsh_build(emb, n_planes=0, n_tables=1, dim=64)
    return S.lsh_query(index, params, queries, k=5)


@register(
    "s22_ivfpq_full_probe_serve",
    category="similarity",
    oracle=_EXACT_TOPK_SQL,
)
def s22_ivfpq_full_probe_serve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """s14/IVFADC's oracle-paired degenerate twin: probing ALL coarse
    cells and widening the rerank shortlist past the corpus size
    (cand_mult*k >= n) makes the ADC stage a pass-through and the
    exact rerank the answer — so the full serve path (residual LUT
    geometry, the cell-key candidate join, ADC ranking's completeness,
    the shortlist broadcast, the exact rerank folds) must hash-equal
    brute force bit-for-bit. A dropped cell, a mis-shaped LUT, or a
    shortlist off-by-one loses a neighbor and fails the gate; ADC's
    APPROXIMATION quality stays the recall harness's job. cand_mult
    derives from the ACTUAL corpus size — a fixed constant silently
    turns degenerate-exact back into approximate at a bigger sf_dir
    (cand_mult=100 covered sf0.01's 500 vectors but pruned true
    neighbors out of sf0.1's 2000 and failed the gate, r12)."""
    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 8)
    k = 5
    n = emb.count()
    index, params = S.ivfpq_build(emb, n_cells=4, n_codes=16)
    return S.ivfpq_query(
        index, params, queries, k=k, n_probe=4, cand_mult=-(-n // k), nq=8
    )


@register(
    "s23_pq_exhaustive_rerank",
    category="similarity",
    oracle=_EXACT_TOPK_SQL,
)
def s23_pq_exhaustive_rerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """s08/flat-PQ's oracle-paired degenerate twin: with the ADC
    shortlist widened past the corpus (cand_mult*k >= n) every
    candidate survives to the exact rerank, so codebook training,
    encoding, the LUT zip_with scan, and the rerank arithmetic are all
    on the hook for a bit-exact brute-force match (pq_encode computes
    norms with the same sequential fold as the JVM for exactly this
    gate). Flat PQ's recall ceiling at scale is documented in
    ANN_RECALL_sf100.json's pq_flat_diagnostic; this pins the
    machinery, not the approximation. cand_mult derives from the
    ACTUAL corpus size (see s22: the fixed constant failed the gate
    at sf0.1)."""
    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 8)
    k = 5
    n = emb.count()
    return S.pq_topk(emb, queries, k=k, cand_mult=-(-n // k))


@register(
    "s15_ivf_index_serve",
    category="similarity",
    oracle=_EXACT_TOPK_SQL,
)
def s15_ivf_index_serve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The build-once/serve-many ANN path (r8 ask #4's API split)
    under the VALUE-HASH gate: ``ivf_build`` constructs the cell-
    assigned index, ``ivf_query`` serves a query batch from it — and
    with n_probe == n_cells the probe degenerates to exact search, so
    the result must hash-equal s01's brute-force oracle bit-for-bit
    (the index path's norms are computed as the same sequential
    left-fold the JVM runs; any drift in the assign pass, the probe
    ranking, or the rerank arithmetic fails the gate). The recall
    tests cover the approximate operating points; THIS pins the
    serving machinery itself to the exact baseline."""
    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 8)
    index, params = S.ivf_build(emb, n_cells=4)
    return S.ivf_query(index, params, queries, k=5, n_probe=4)


@register(
    "s16_ivf_serve_tombstones",
    category="similarity",
    oracle=f"""
SELECT query_id, neighbor_id, cos_sim, rank FROM (
  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
         {_COS.format(a='q.embedding', b='c.embedding')} AS cos_sim,
         ROW_NUMBER() OVER (
           PARTITION BY q.vec_id
           ORDER BY {_COS.format(a='q.embedding', b='c.embedding')} DESC,
                    c.vec_id) AS rank
  FROM embeddings q, embeddings c
  WHERE q.vec_id < 8 AND c.vec_id <> q.vec_id AND c.vec_id % 7 <> 3
) WHERE rank <= 5
""",
)
def s16_ivf_serve_tombstones(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deletes between index rebuilds: serve an ANN query batch from a
    STORED IVF index with a tombstone mask for corpus vectors deleted
    after the build (``vec_id % 7 == 3`` here). The mask is a
    broadcast anti-join against the index — the index never shuffles
    and never rebuilds; a deleted doc can still BE a query (vec_id 3
    is both). At full probe the serve path is exact, so the result
    must hash-equal brute force over the corpus-minus-deleted — which
    pins the mask semantics (no deleted neighbor survives, no live
    neighbor is lost) bit-for-bit, the same way s15 pins the unmasked
    serve machinery."""
    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 8)
    deleted = emb.filter(F.col("vec_id") % 7 == 3).select("vec_id")
    index, params = S.ivf_build(emb, n_cells=4)
    return S.ivf_query(
        index, params, queries, k=5, n_probe=4, exclude=deleted
    )


@register(
    "s17_vector_store_serve",
    category="similarity",
    oracle=f"""
SELECT query_id, neighbor_id, cos_sim, rank FROM (
  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
         {_COS.format(a='q.embedding', b='c.embedding')} AS cos_sim,
         ROW_NUMBER() OVER (
           PARTITION BY q.vec_id
           ORDER BY {_COS.format(a='q.embedding', b='c.embedding')} DESC,
                    c.vec_id) AS rank
  FROM embeddings q, embeddings c
  WHERE q.vec_id < 8 AND c.vec_id <> q.vec_id AND c.vec_id % 11 <> 5
) WHERE rank <= 5
""",
)
def s17_vector_store_serve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The lakehouse->ANN integration, end to end: embeddings live in
    a versioned ``BucketedTableStore``; the IVF index is built once at
    version 1; a DELETE lands as a merge-on-read commit (O(batch)
    tombstones, no bucket rewrite — and no index rebuild); the serve
    path derives its tombstone mask FROM THE STORE'S OWN CHANGE FEED
    (v1 -> v2 deleted keys) and masks the stored index with it. At
    full probe the serve is exact, so the result must hash-equal
    brute force over the store's CURRENT snapshot — pinning the whole
    chain: MoR delete commit, CDC feed, mask anti-join, probe rerank.
    At 100 TB this is how a vector store stays fresh between index
    rebuilds: deletes cost one delta commit + one broadcast-sized key
    set at serve time, both bounded by the compaction policy."""
    import tempfile

    from etl_notifier_pipeline_spark.operators.mutations import change_feed
    from etl_notifier_pipeline_spark.storage import BucketedTableStore

    emb = load_table(spark, sf_dir, "embeddings")
    store = BucketedTableStore(
        spark, tempfile.mkdtemp(prefix="s17_"),
        keys={"vectors": ["vec_id"]}, n_buckets=8,
    )
    store.overwrite("vectors", emb)
    index, params = S.ivf_build(store.read("vectors", version=1), n_cells=4)
    store.apply_keyed_mutation(
        "vectors",
        emb.filter(F.col("vec_id") % 11 == 5).select("vec_id"),
        ["vec_id"],
        [],
        "delete",
        strategy="merge_on_read",
    )
    feed = change_feed(store, "vectors", ["vec_id"], 1, 2)
    tombs = feed.filter(F.col("change") == "delete").select("vec_id")
    queries = emb.filter(F.col("vec_id") < 8)
    return S.ivf_query(index, params, queries, k=5, n_probe=4, exclude=tombs)


@register(
    "s18_ivf_incremental_append",
    category="similarity",
    oracle=f"""
SELECT query_id, neighbor_id, cos_sim, rank FROM (
  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
         {_COS.format(a='q.embedding', b='c.embedding')} AS cos_sim,
         ROW_NUMBER() OVER (
           PARTITION BY q.vec_id
           ORDER BY {_COS.format(a='q.embedding', b='c.embedding')} DESC,
                    c.vec_id) AS rank
  FROM embeddings q, embeddings c
  WHERE q.vec_id < 8 AND c.vec_id <> q.vec_id
) WHERE rank <= 5
""",
)
def s18_ivf_incremental_append(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental index maintenance, the other half of the lifecycle
    s16/s17 cover for deletes: the IVF index is BUILT on the first
    2/3 of the corpus (``vec_id % 3 != 0``), then the remaining third
    arrives later and is folded in via ``ivf_append`` — an
    O(increment) assign pass against the frozen centroids, unioned
    onto the stored index without reading or rewriting it. At full
    probe the serve is exact, so the result must hash-equal brute
    force over the WHOLE corpus: built and appended rows are
    indistinguishable to the serve path, byte for byte. At 100 TB
    this is how a vector store ingests between rebuilds: each batch
    costs one assign pass + one parquet append, exactly a
    merge-on-read delta's write contract."""
    emb = load_table(spark, sf_dir, "embeddings")
    initial = emb.filter(F.col("vec_id") % 3 != 0)
    late = emb.filter(F.col("vec_id") % 3 == 0)
    index, params = S.ivf_build(initial, n_cells=4)
    full_index = index.unionByName(S.ivf_append(params, late))
    queries = emb.filter(F.col("vec_id") < 8)
    return S.ivf_query(full_index, params, queries, k=5, n_probe=4)


@register(
    "s19_ivfpq_incremental_append",
    category="similarity",
    oracle=f"""
SELECT query_id, neighbor_id, cos_sim, rank FROM (
  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
         {_COS.format(a='q.embedding', b='c.embedding')} AS cos_sim,
         ROW_NUMBER() OVER (
           PARTITION BY q.vec_id
           ORDER BY {_COS.format(a='q.embedding', b='c.embedding')} DESC,
                    c.vec_id) AS rank
  FROM embeddings q, embeddings c
  WHERE q.vec_id < 8 AND c.vec_id <> q.vec_id
) WHERE rank <= 5
""",
)
def s19_ivfpq_incremental_append(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """s18's compressed-index twin: the IVFADC index is BUILT on 2/3
    of the corpus, the remaining third arrives later via
    ``ivfpq_append`` (assign + residual-encode against the FROZEN
    centroids and codebooks, one parquet-append-shaped union). Served
    at full probe with the rerank width opened to the whole corpus,
    the exact rerank inspects every candidate — so the result must
    hash-equal brute force over the full corpus even though the
    appended rows were quantized by codebooks that never saw them
    (quantization error affects only the ADC ORDERING, which the
    exhaustive rerank makes immaterial at this operating point; the
    recall tests cover the approximate points). The rerank width
    scales with the corpus so the pin holds at any sf."""
    emb = load_table(spark, sf_dir, "embeddings")
    initial = emb.filter(F.col("vec_id") % 3 != 0)
    late = emb.filter(F.col("vec_id") % 3 == 0)
    index, params = S.ivfpq_build(
        initial, n_cells=4, n_probe=4, m=8, n_codes=16
    )
    full_index = index.unionByName(S.ivfpq_append(params, late))
    queries = emb.filter(F.col("vec_id") < 8)
    n = emb.count()
    return S.ivfpq_query(
        full_index, params, queries, k=5, n_probe=4,
        cand_mult=max(40, -(-n // 5)), nq=8,
    )
