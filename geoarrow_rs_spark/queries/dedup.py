"""dedup query-catalog entries (split from queries.py, round 6)."""

from ._shared import *  # noqa: F401,F403
from ._shared import (  # noqa: F401
    _BM25_K1P1,
    _BM25_TERMS,
    _GRAM8_SQL,
    _NG3,
    _NS_GAP,
    _NS_HOUR,
    _banded_block,
    _hits_sql,
    _luhn_sql,
    _minhash_pairs_cte,
    _money_sum,
    _money_sum_sql,
    _spread,
    _t,
)



def dedup_simhash_signatures(spark, sf_dir):
    """SimHash signatures via explode + codegen'd bit-vote aggregation,
    hash-verified against the md5 bit arithmetic mirrored in DuckDB SQL."""
    from ..datapipe.dedup import simhash_signatures

    d = _t(spark, sf_dir, "documents")
    return simhash_signatures(d, "doc_id", "text")


# ---------------------------------------------------------------------------
# dedup / text / similarity (documents, embeddings)
# ---------------------------------------------------------------------------

def dedup_exact_stats(spark, sf_dir):
    """Exact duplicate-group statistics by content digest (one digest-keyed shuffle)."""
    d = _t(spark, sf_dir, "documents")
    return d.agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.countDistinct(F.md5(F.col("text").cast("binary"))).alias("n_unique"),
    )


ORACLE_DEDUP_EXACT = """
SELECT COUNT(*) AS n_docs, COUNT(DISTINCT md5(text)) AS n_unique FROM documents
"""


def dedup_exact_keepers(spark, sf_dir):
    """Exact dedup keep-first materialization: one survivor per digest."""
    d = _t(spark, sf_dir, "documents")
    kept = dedup.exact_dedup(d, "text", "doc_id", keep="min")
    return kept.agg(
        F.count(F.lit(1)).alias("n_kept"), F.sum("doc_id").alias("id_checksum")
    )


ORACLE_DEDUP_KEEPERS = """
SELECT COUNT(*) AS n_kept, CAST(SUM(doc_id) AS BIGINT) AS id_checksum
FROM (SELECT MIN(doc_id) AS doc_id FROM documents GROUP BY md5(text))
"""


def dedup_minhash_pairs(spark, sf_dir):
    """Banded-minhash LSH candidate pairs (band equi-join, no all-pairs); full SQL oracle replays grams -> signatures -> bands."""
    d = _t(spark, sf_dir, "documents")
    pairs = dedup.minhash_lsh_pairs(
        d, "doc_id", "text", num_perm=16, bands=4, shingle=8, max_chars=128
    )
    return pairs.select("a_id", "b_id")


def dedup_incremental_keepers(spark, sf_dir):
    """Incremental ingestion dedup (dedup.incremental_dedup): the batch
    doc_id >= 250 is admitted against the existing corpus doc_id < 250 —
    exact digests (existing + earlier-in-batch) and LSH band collisions
    with the existing corpus both reject; existing text is only read as
    digest/band projections (O(batch), not O(corpus), per run)."""
    d = _t(spark, sf_dir, "documents")
    existing = d.where(F.col("doc_id") < 250)
    incoming = d.where(F.col("doc_id") >= 250)
    out = dedup.incremental_dedup(
        existing, incoming, num_perm=16, bands=4, shingle=8, max_chars=128
    )
    return out.select("doc_id", F.md5(F.col("text")).alias("text_md5"))


ORACLE_DEDUP_INCREMENTAL = f"""
WITH existing AS (SELECT doc_id, text FROM documents WHERE doc_id < 250),
incoming AS (SELECT doc_id, text FROM documents WHERE doc_id >= 250),
inc_first AS (
  SELECT doc_id, text FROM (
    SELECT doc_id, text,
           row_number() OVER (PARTITION BY md5(text) ORDER BY doc_id) AS rn
    FROM incoming
  ) WHERE rn = 1
),
ex_dig AS (SELECT DISTINCT md5(text) AS dig FROM existing),
inc_new AS (
  SELECT i.doc_id, i.text FROM inc_first i
  LEFT JOIN ex_dig e ON md5(i.text) = e.dig
  WHERE e.dig IS NULL
),
{_banded_block('existing', 'ex')},
{_banded_block('inc_new', 'in')},
exb AS (SELECT DISTINCT band FROM exbanded),
hits AS (
  SELECT DISTINCT i.doc_id FROM inbanded i JOIN exb ON i.band = exb.band
)
SELECT n.doc_id, md5(n.text) AS text_md5
FROM inc_new n LEFT JOIN hits h ON n.doc_id = h.doc_id
WHERE h.doc_id IS NULL
"""


def dedup_lsh_eval(spark, sf_dir):
    """LSH quality evaluation on a bounded sample (doc_id < 100): exact
    8-gram Jaccard for ALL sample pairs (deliberate bounded cartesian —
    evaluation only, never the production path) vs banded-minhash
    candidacy. One row: pair counts, confusion counts at Jaccard >= 0.5,
    and the mean Jaccard of candidates vs non-candidates — the
    measurement you run before trusting an LSH parameterization at
    corpus scale."""
    d = _t(spark, sf_dir, "documents").where(F.col("doc_id") < 100).select(
        "doc_id", "text"
    )
    a = d.select(F.col("doc_id").alias("a_id"), F.col("text").alias("__ta"))
    b = d.select(F.col("doc_id").alias("b_id"), F.col("text").alias("__tb"))
    jacc = F.round(
        dedup.ngram_jaccard(F.col("__ta"), F.col("__tb"), n=8, max_chars=128), 6
    )
    allp = (
        a.crossJoin(b)
        .where(F.col("a_id") < F.col("b_id"))
        .select("a_id", "b_id", jacc.alias("__j"))
    )
    cands = dedup.minhash_lsh_pairs(
        d, "doc_id", "text", num_perm=16, bands=4, shingle=8, max_chars=128
    ).select("a_id", "b_id").withColumn("__cand", F.lit(True))
    lab = allp.join(cands, on=["a_id", "b_id"], how="left").select(
        "__j", F.coalesce(F.col("__cand"), F.lit(False)).alias("__c")
    )
    dec = "decimal(38,12)"
    pos = F.col("__j") >= 0.5
    c = F.col("__c")
    mean_of = lambda cond: F.round(
        (
            F.sum(F.when(cond, F.col("__j").cast(dec)).otherwise(F.lit(0).cast(dec))).cast("double")
        )
        / F.greatest(F.sum(cond.cast("long")).cast("double"), F.lit(1.0)),
        6,
    )
    return lab.agg(
        F.count(F.lit(1)).alias("n_pairs"),
        F.sum(c.cast("long")).alias("n_cand"),
        F.sum((pos & c).cast("long")).alias("tp"),
        F.sum(((~pos) & c).cast("long")).alias("fp"),
        F.sum((pos & (~c)).cast("long")).alias("fn"),
        mean_of(c).alias("mean_jacc_cand"),
        mean_of(~c).alias("mean_jacc_noncand"),
    )


def _lsh_eval_oracle_sql():
    gram8 = (
        "CASE WHEN length(substr({t}, 1, 128)) < 8 THEN [substr({t}, 1, 128)] "
        "ELSE list_transform(range(1, length(substr({t}, 1, 128)) - 6), "
        "i -> substr(substr({t}, 1, 128), CAST(i AS INT), 8)) END"
    )
    mean_of = (
        "round(CAST(SUM(CASE WHEN {cond} THEN CAST(j AS DECIMAL(38,12)) "
        "ELSE CAST(0 AS DECIMAL(38,12)) END) AS DOUBLE) "
        "/ greatest(CAST(SUM(CASE WHEN {cond} THEN 1 ELSE 0 END) AS DOUBLE), 1.0), 6)"
    )
    return f"""
WITH sample AS (SELECT doc_id, text FROM documents WHERE doc_id < 100),
{_banded_block('sample', 'sm')},
cand AS (
  SELECT DISTINCT a.doc_id AS a_id, b.doc_id AS b_id
  FROM smbanded a JOIN smbanded b ON a.band = b.band
  WHERE a.doc_id < b.doc_id
),
gsets AS (
  SELECT doc_id, list_distinct({gram8.format(t='text')}) AS gs FROM sample
),
allp AS (
  SELECT a.doc_id AS a_id, b.doc_id AS b_id,
         round(CASE WHEN len(list_distinct(list_concat(a.gs, b.gs))) > 0
               THEN CAST(len(list_intersect(a.gs, b.gs)) AS DOUBLE)
                    / CAST(len(list_distinct(list_concat(a.gs, b.gs))) AS DOUBLE)
               ELSE 0.0 END, 6) AS j
  FROM gsets a JOIN gsets b ON a.doc_id < b.doc_id
),
lab AS (
  SELECT p.j, (c.a_id IS NOT NULL) AS cand
  FROM allp p LEFT JOIN cand c ON p.a_id = c.a_id AND p.b_id = c.b_id
)
SELECT COUNT(*) AS n_pairs,
       CAST(SUM(CASE WHEN cand THEN 1 ELSE 0 END) AS BIGINT) AS n_cand,
       CAST(SUM(CASE WHEN j >= 0.5 AND cand THEN 1 ELSE 0 END) AS BIGINT) AS tp,
       CAST(SUM(CASE WHEN j < 0.5 AND cand THEN 1 ELSE 0 END) AS BIGINT) AS fp,
       CAST(SUM(CASE WHEN j >= 0.5 AND NOT cand THEN 1 ELSE 0 END) AS BIGINT) AS fn,
       {mean_of.format(cond='cand')} AS mean_jacc_cand,
       {mean_of.format(cond='NOT cand')} AS mean_jacc_noncand
FROM lab
"""


ORACLE_DEDUP_LSH_EVAL = _lsh_eval_oracle_sql()


def dedup_substring_spans(spark, sf_dir):
    """Span-level exact-duplicate signal: fraction of each document's 30-char
    windows that occur in at least one other document (explode -> hash ->
    single groupBy -> join back; no all-pairs)."""
    d = _t(spark, sf_dir, "documents")
    return dedup.substring_dup_stats(d, "doc_id", "text", n=30, max_chars=256)


ORACLE_DEDUP_SUBSTRING = """
WITH g AS (
  SELECT doc_id,
         CAST(concat('0x', substr(md5(w), 1, 15)) AS BIGINT) AS h
  FROM (
    SELECT doc_id,
           CASE WHEN length(substr(text, 1, 256)) < 30
                THEN [substr(text, 1, 256)]
                ELSE list_transform(range(1, length(substr(text, 1, 256)) - 28),
                                    i -> substr(substr(text, 1, 256), CAST(i AS INT), 30))
           END AS ws
    FROM documents
  ), unnest(ws) AS t(w)
),
per_gram AS (
  SELECT h, COUNT(DISTINCT doc_id) AS ndocs FROM g GROUP BY h
)
SELECT g.doc_id,
       COUNT(*) AS n_windows,
       CAST(SUM(CASE WHEN p.ndocs >= 2 THEN 1 ELSE 0 END) AS BIGINT) AS n_dup_windows,
       round(CAST(SUM(CASE WHEN p.ndocs >= 2 THEN 1 ELSE 0 END) AS DOUBLE)
             / CAST(COUNT(*) AS DOUBLE), 6) AS dup_frac
FROM g JOIN per_gram p ON g.h = p.h
GROUP BY g.doc_id
"""


def dedup_clusters_assignment(spark, sf_dir):
    """Near-duplicate clustering: connected components over banded-minhash
    candidate pairs (distributed min-label propagation), every document
    assigned cluster_id = min doc id in its component. The oracle replays
    the same pairs and closes them with a recursive CTE."""
    d = _t(spark, sf_dir, "documents")
    pairs = dedup.minhash_lsh_pairs(
        d, "doc_id", "text", num_perm=16, bands=4, shingle=8, max_chars=128
    )
    return dedup.dedup_clusters(d, pairs, id_col="doc_id")


ORACLE_DEDUP_CLUSTERS = f"""
WITH RECURSIVE {_minhash_pairs_cte()},
edges AS (
  SELECT a_id AS src, b_id AS dst FROM pairs
  UNION
  SELECT b_id AS src, a_id AS dst FROM pairs
),
cc(node, label) AS (
  SELECT DISTINCT src, src FROM edges
  UNION
  SELECT e.src, cc.label FROM edges e JOIN cc ON e.dst = cc.node
),
best AS (SELECT node, MIN(label) AS cl FROM cc GROUP BY node)
SELECT d.doc_id, COALESCE(best.cl, d.doc_id) AS cluster_id
FROM documents d LEFT JOIN best ON d.doc_id = best.node
"""


def dedup_minhash_refined(spark, sf_dir):
    """LSH candidates refined by EXACT shingle-Jaccard >= 0.5 (the
    two-stage near-dup shape: cheap banded recall, exact precision
    filter — text joins into the band match only because the refine
    needs it). Output includes the exact Jaccard per surviving pair."""
    d = _t(spark, sf_dir, "documents")
    pairs = dedup.minhash_lsh_pairs(
        d, "doc_id", "text", num_perm=16, bands=4, shingle=8, max_chars=128,
        jaccard_threshold=0.5,
    )
    return pairs.select("a_id", "b_id", F.round(F.col("jaccard"), 6).alias("jaccard"))


ORACLE_DEDUP_MINHASH_REFINED = f"""
WITH {_minhash_pairs_cte()},
gs AS (SELECT doc_id, {_GRAM8_SQL.format(t='text')} AS g FROM documents),
scored AS (
  SELECT p.a_id, p.b_id,
         CASE WHEN len(list_distinct(list_concat(a.g, b.g))) > 0
              THEN CAST(len(list_intersect(a.g, b.g)) AS DOUBLE)
                   / CAST(len(list_distinct(list_concat(a.g, b.g))) AS DOUBLE)
              ELSE 0.0 END AS j
  FROM pairs p JOIN gs a ON p.a_id = a.doc_id JOIN gs b ON p.b_id = b.doc_id
)
SELECT a_id, b_id, round(j, 6) AS jaccard FROM scored WHERE j >= 0.5
"""


def dedup_graph_pagerank(spark, sf_dir):
    """PageRank over the near-duplicate candidate graph (datapipe.graph):
    3 power iterations, damping 0.85, decimal-accumulated contributions —
    the duplication-centrality quality signal, bit-reproducible because
    every float op sequence is fixed. Oracle unrolls the rounds in CTEs
    over the same banded-minhash pair graph."""
    from ..datapipe import graph

    d = _t(spark, sf_dir, "documents")
    pairs = dedup.minhash_lsh_pairs(
        d, "doc_id", "text", num_perm=16, bands=4, shingle=8, max_chars=128
    )
    return graph.pagerank(d, pairs, id_col="doc_id", iters=3, damping=0.85)


def dedup_graph_triangles(spark, sf_dir):
    """Per-node triangle counts over the near-duplicate candidate graph
    (graph.triangle_count): degree-ordered edge orientation counts each
    triangle once at its minimum (degree, id) vertex and bounds the wedge
    join at O(|E|^1.5) — the local-clustering duplicate signal next to
    pagerank's global one. All exact integers; the oracle replays the
    orientation and joins verbatim."""
    from ..datapipe import graph

    d = _t(spark, sf_dir, "documents")
    pairs = dedup.minhash_lsh_pairs(
        d, "doc_id", "text", num_perm=16, bands=4, shingle=8, max_chars=128
    )
    out = graph.triangle_count(pairs)
    return out.select(
        F.col("node").cast("long").alias("node"),
        F.col("tri_count").cast("long").alias("tri_count"),
    )


def _triangles_oracle_sql() -> str:
    fwd = "(da < db) OR (da = db AND a < b)"
    return f"""
WITH {_minhash_pairs_cte()}, e AS (
  SELECT DISTINCT LEAST(a_id, b_id) AS a, GREATEST(a_id, b_id) AS b
  FROM pairs WHERE a_id <> b_id
), deg AS (
  SELECT n, COUNT(*) AS dg
  FROM (SELECT a AS n FROM e UNION ALL SELECT b AS n FROM e) GROUP BY n
), ed AS (
  SELECT e.a, e.b, dda.dg AS da, ddb.dg AS db
  FROM e JOIN deg dda ON e.a = dda.n JOIN deg ddb ON e.b = ddb.n
), directed AS (
  SELECT CASE WHEN {fwd} THEN a ELSE b END AS u,
         CASE WHEN {fwd} THEN b ELSE a END AS v,
         CASE WHEN {fwd} THEN db ELSE da END AS dv
  FROM ed
), wedges AS (
  SELECT d1.u, d1.v AS v1, d2.v AS v2
  FROM directed d1 JOIN directed d2 ON d1.u = d2.u
  WHERE (d1.dv < d2.dv) OR (d1.dv = d2.dv AND d1.v < d2.v)
), tris AS (
  SELECT u, v1, v2 FROM wedges w
  WHERE EXISTS (SELECT 1 FROM directed c WHERE c.u = w.v1 AND c.v = w.v2)
), tnodes AS (
  SELECT unnest([u, v1, v2]) AS node FROM tris
)
SELECT CAST(node AS BIGINT) AS node, COUNT(*) AS tri_count
FROM tnodes GROUP BY node
"""


ORACLE_DEDUP_TRIANGLES = _triangles_oracle_sql()


def dedup_graph_kcore(spark, sf_dir):
    """2-core of the near-duplicate candidate graph (graph.k_core):
    iterative peel dropping degree<2 fringe nodes — what survives is the
    densely-duplicated community worth batch-deduping. Runs exactly 4
    peel rounds with early_stop off so the DuckDB oracle can unroll the
    identical rounds as CTEs (tests pin that the peel has converged by
    round 4 on this data, so the output IS the true 2-core)."""
    from ..datapipe import graph

    d = _t(spark, sf_dir, "documents")
    pairs = dedup.minhash_lsh_pairs(
        d, "doc_id", "text", num_perm=16, bands=4, shingle=8, max_chars=128
    )
    out = graph.k_core(pairs, k=2, rounds=4, early_stop=False)
    return out.select("node", "core_deg")


def _kcore_oracle_sql(k: int = 2, rounds: int = 4) -> str:
    # AS MATERIALIZED: each round references the previous one 3x — an
    # inlining optimizer would otherwise expand the heavy pairs CTE 3^rounds
    # times (measured 300s vs <20s at sf0.001)
    parts = [
        "e0 AS MATERIALIZED (SELECT DISTINCT LEAST(a_id, b_id) AS a,"
        " GREATEST(a_id, b_id) AS b FROM pairs WHERE a_id <> b_id)"
    ]
    for r in range(rounds):
        parts.append(
            f"d{r} AS MATERIALIZED (SELECT n, COUNT(*) AS dg FROM"
            f" (SELECT a AS n FROM e{r} UNION ALL SELECT b AS n FROM e{r})"
            f" GROUP BY n)"
        )
        parts.append(f"k{r} AS MATERIALIZED (SELECT n FROM d{r} WHERE dg >= {k})")
        parts.append(
            f"e{r + 1} AS MATERIALIZED (SELECT e{r}.a, e{r}.b FROM e{r}"
            f" JOIN k{r} ka ON e{r}.a = ka.n"
            f" JOIN k{r} kb ON e{r}.b = kb.n)"
        )
    parts.append(
        f"dfin AS (SELECT n, COUNT(*) AS dg FROM"
        f" (SELECT a AS n FROM e{rounds} UNION ALL SELECT b AS n FROM e{rounds})"
        f" GROUP BY n)"
    )
    return (
        f"WITH {_minhash_pairs_cte()}, "
        + ", ".join(parts)
        + f" SELECT n AS node, dg AS core_deg FROM dfin WHERE dg >= {k}"
    )


ORACLE_DEDUP_KCORE = _kcore_oracle_sql()


def dedup_graph_harmonic(spark, sf_dir):
    """HyperBall harmonic centrality over the near-duplicate candidate
    graph (graph.neighborhood_function): per-node KMV neighborhood
    sketches (k=32) merged over 3 hops — constant state per node
    regardless of ball size, the CommonCrawl-style page-quality signal.
    Deterministic (KMV, not HLL), so the oracle unrolls the 3 sketch-
    merge rounds as CTEs and matches bit-for-bit."""
    from ..datapipe import graph

    d = _t(spark, sf_dir, "documents")
    pairs = dedup.minhash_lsh_pairs(
        d, "doc_id", "text", num_perm=16, bands=4, shingle=8, max_chars=128
    )
    return graph.neighborhood_function(pairs, k=32, hops=3)


def _harmonic_oracle_sql(k=32, hops=3) -> str:
    est_const = repr(float(k - 1) * float(1 << 60))
    rounds = []
    prev = "s0"
    for h in range(1, hops + 1):
        rounds.append(f"""m{h} AS (
  SELECT e.src AS node, s.hs FROM e JOIN {prev} s ON e.dst = s.node
  UNION ALL SELECT node, hs FROM {prev}
), x{h} AS (
  SELECT DISTINCT node, unnest(hs) AS hv FROM m{h}
), s{h} AS (
  SELECT node, list(hv ORDER BY hv) AS hs FROM (
    SELECT node, hv FROM x{h}
    QUALIFY row_number() OVER (PARTITION BY node ORDER BY hv) <= {k}
  ) GROUP BY node
)""")
        prev = f"s{h}"

    def ni(h):
        return (
            f"CAST(round((CASE WHEN len(s{h}.hs) < {k} "
            f"THEN CAST(len(s{h}.hs) AS DOUBLE) "
            f"ELSE round(CAST({est_const} AS DOUBLE) / CAST(s{h}.hs[{k}] AS DOUBLE), 6) "
            f"END) * 1e6) AS BIGINT)"
        )

    joins = " ".join(
        f"JOIN s{h} ON s1.node = s{h}.node" for h in range(2, hops + 1)
    )
    balls_cols = ", ".join(f"{ni(h)} AS n{h}i" for h in range(1, hops + 1))
    import math as _math

    lcm = _math.lcm(*range(1, hops + 1))
    harm_terms = []
    prev_expr = "1000000"
    for h in range(1, hops + 1):
        harm_terms.append(f"{lcm // h} * (n{h}i - {prev_expr})")
        prev_expr = f"n{h}i"
    n_cols = ",\n       ".join(
        f"CAST(n{h}i AS DOUBLE) / 1000000.0 AS n{h}" for h in range(1, hops + 1)
    )
    return f"""
WITH {_minhash_pairs_cte()}, e0 AS (
  SELECT DISTINCT CAST(a_id AS BIGINT) AS src, CAST(b_id AS BIGINT) AS dst
  FROM pairs WHERE a_id <> b_id
), e AS (
  SELECT DISTINCT src, dst FROM (
    SELECT src, dst FROM e0 UNION ALL SELECT dst AS src, src AS dst FROM e0
  )
), n0 AS (
  SELECT DISTINCT src AS node FROM e
), s0 AS (
  SELECT node,
         [CAST(concat('0x', substr(md5(concat('anf:', CAST(node AS VARCHAR))), 1, 15)) AS BIGINT)] AS hs
  FROM n0
), {', '.join(rounds)},
balls AS (
  SELECT s1.node, {balls_cols}
  FROM s1 {joins}
)
SELECT node,
       {n_cols},
       CAST({' + '.join(harm_terms)} AS DOUBLE) / {float(lcm) * 1e6!r} AS harmonic
FROM balls
"""


ORACLE_DEDUP_HARMONIC = _harmonic_oracle_sql()


def _pagerank_oracle_sql(iters=3, damping=0.85):
    d = repr(float(damping))
    one_minus_d = repr(1.0 - float(damping))  # Python's 1.0-0.85 bit pattern
    ctes = [
        _minhash_pairs_cte(),
        """e0 AS (
  SELECT DISTINCT CAST(a_id AS BIGINT) AS src, CAST(b_id AS BIGINT) AS dst
  FROM pairs WHERE a_id <> b_id
)""",
        "e AS (SELECT src, dst FROM e0 UNION ALL SELECT dst AS src, src AS dst FROM e0)",
        "deg AS (SELECT src, COUNT(*) AS dg FROM e GROUP BY src)",
        "allnodes AS (SELECT CAST(doc_id AS BIGINT) AS node, (SELECT COUNT(*) FROM documents) AS N FROM documents)",
        "pr0 AS (SELECT node, round(1.0 / CAST(N AS DOUBLE), 12) AS pr FROM allnodes)",
    ]
    for i in range(iters):
        ctes += [
            f"""c{i} AS (
  SELECT e.dst AS node,
         CAST(round(p.pr / CAST(d.dg AS DOUBLE), 12) AS DECIMAL(38,12)) AS c
  FROM e JOIN deg d ON e.src = d.src JOIN pr{i} p ON e.src = p.node
)""",
            f"s{i} AS (SELECT node, SUM(c) AS s FROM c{i} GROUP BY node)",
            f"""pr{i + 1} AS (
  SELECT b.node,
         round({one_minus_d} / CAST(b.N AS DOUBLE)
               + {d} * COALESCE(CAST(s.s AS DOUBLE), 0.0), 12) AS pr
  FROM allnodes b LEFT JOIN s{i} s ON b.node = s.node
)""",
        ]
    return (
        "WITH " + ",\n".join(ctes)
        + f"\nSELECT node AS doc_id, pr FROM pr{iters}\n"
    )


ORACLE_DEDUP_PAGERANK = _pagerank_oracle_sql()


def dedup_corpus_keepers(spark, sf_dir):
    """END-TO-END near-dup dedup: LSH candidate pairs -> connected
    components -> keep ONE canonical doc per cluster (the min id — the
    standard 'keep first' policy) -> materialize the surviving corpus.
    This is the actual output a training pipeline ships; the oracle closes
    the same pairs with a recursive CTE and anti-selects non-canonical
    members."""
    d = _t(spark, sf_dir, "documents")
    pairs = dedup.minhash_lsh_pairs(
        d, "doc_id", "text", num_perm=16, bands=4, shingle=8, max_chars=128
    )
    assign = dedup.dedup_clusters(d, pairs, id_col="doc_id")
    keepers = assign.where(F.col("cluster_id") == F.col("doc_id")).select("doc_id")
    return (
        d.join(keepers, on="doc_id", how="left_semi")
        .select("doc_id", "n_chars")
    )


ORACLE_DEDUP_CORPUS = f"""
WITH RECURSIVE {_minhash_pairs_cte()},
edges AS (
  SELECT a_id AS src, b_id AS dst FROM pairs
  UNION
  SELECT b_id AS src, a_id AS dst FROM pairs
),
cc(node, label) AS (
  SELECT DISTINCT src, src FROM edges
  UNION
  SELECT e.src, cc.label FROM edges e JOIN cc ON e.dst = cc.node
),
best AS (SELECT node, MIN(label) AS cl FROM cc GROUP BY node)
SELECT d.doc_id, d.n_chars
FROM documents d LEFT JOIN best ON d.doc_id = best.node
WHERE COALESCE(best.cl, d.doc_id) = d.doc_id
"""
