"""pipe query-catalog entries (split from queries.py, round 6)."""

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



def pipe_sample_split(spark, sf_dir):
    """Deterministic sampling + train/val/test split: md5-keyed, so the
    assignment is identical across reruns, partitionings, and engines
    (df.sample's per-partition RNG is none of those). Output: per-split
    row counts and token totals over a 50% sample."""
    from ..datapipe import sampling, text

    d = _t(spark, sf_dir, "documents")
    sampled = sampling.deterministic_sample(d, "doc_id", 0.5)
    split = sampling.train_val_test_split(sampled, "doc_id", val=0.1, test=0.1)
    return (
        split.groupBy("split")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(text.token_count("text").cast("long")).alias("n_tokens"),
        )
    )


ORACLE_PIPE_SAMPLE_SPLIT = """
WITH sampled AS (
  SELECT doc_id, text,
         CAST(concat('0x', substr(md5(concat('split:', CAST(doc_id AS VARCHAR))), 1, 8)) AS BIGINT) / 4294967296.0 AS su
  FROM documents
  WHERE CAST(concat('0x', substr(md5(concat('sample:', CAST(doc_id AS VARCHAR))), 1, 8)) AS BIGINT) / 4294967296.0 < 0.5
), labeled AS (
  SELECT doc_id, text,
         CASE WHEN su < 0.1 THEN 'val' WHEN su < 0.2 THEN 'test' ELSE 'train' END AS split
  FROM sampled
)
SELECT split, COUNT(*) AS n_docs,
       CAST(SUM(CAST(len(list_filter(regexp_split_to_array(text, '\\s+'), x -> x <> '')) AS BIGINT)) AS BIGINT) AS n_tokens
FROM labeled GROUP BY split
"""


def pipe_scrub_text(spark, sf_dir):
    """PII-style scrubbing (emails/URLs -> placeholder tokens) with native
    regexp_replace; patterns live in the Java-regex/RE2 common subset so
    DuckDB replays them byte-for-byte."""
    from ..datapipe import sampling

    d = _t(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        F.md5(sampling.scrub_text("text")).alias("scrubbed_md5"),
        F.length(sampling.scrub_text("text")).alias("scrubbed_len"),
    )


ORACLE_PIPE_SCRUB = """
SELECT doc_id,
       md5(regexp_replace(regexp_replace(text, 'https?://[^ \\t\\n]+', '<URL>', 'g'),
                          '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z][A-Za-z]+', '<EMAIL>', 'g')) AS scrubbed_md5,
       CAST(length(regexp_replace(regexp_replace(text, 'https?://[^ \\t\\n]+', '<URL>', 'g'),
                          '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z][A-Za-z]+', '<EMAIL>', 'g')) AS INT) AS scrubbed_len
FROM documents
"""


def pipe_scrub_pii(spark, sf_dir):
    """Luhn-validated PII scrubbing: phones and IPv4s by pattern, 16-digit
    card numbers only when the Luhn mod-10 checksum passes (pure codegen —
    the checksum is unrolled to 16 substring terms, no UDF). The synthetic
    documents are digit-free, so the query plants one deterministic
    phone/ip/card span per row from doc_id (identically in both engines);
    card validity varies by id, so both the scrub and the skip paths are
    exercised."""
    from ..datapipe import sampling

    d = _t(spark, sf_dir, "documents")
    last4 = F.lpad((F.col("doc_id") % 10000).cast("string"), 4, "0")
    aug = F.concat(
        F.col("text"),
        F.lit(" phone 555-123-"), last4,
        F.lit(" ip 10.0."), (F.col("doc_id") % 256).cast("string"),
        F.lit(".7 card 411111111111"), last4,
    )
    scrubbed = sampling.scrub_pii(aug)
    return d.select(
        "doc_id",
        F.md5(scrubbed).alias("scrubbed_md5"),
        scrubbed.contains("<CC>").alias("cc_scrubbed"),
    )


ORACLE_PIPE_SCRUB_PII = f"""
WITH aug AS (
  SELECT doc_id,
         text || ' phone 555-123-' || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0')
              || ' ip 10.0.' || CAST(doc_id % 256 AS VARCHAR) || '.7 card 411111111111'
              || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0') AS t
  FROM documents
), s1 AS (
  SELECT doc_id,
         regexp_replace(regexp_replace(t, '\\+?[0-9]{{3}}[- ][0-9]{{3}}[- ][0-9]{{4}}', '<PHONE>', 'g'),
                        '[0-9]{{1,3}}\\.[0-9]{{1,3}}\\.[0-9]{{1,3}}\\.[0-9]{{1,3}}', '<IP>', 'g') AS s
  FROM aug
), s2 AS (
  SELECT doc_id, s, regexp_extract(s, '[0-9]{{16}}', 0) AS cand FROM s1
), s3 AS (
  SELECT doc_id,
         CASE WHEN cand <> '' AND {_luhn_sql('cand')}
              THEN replace(s, cand, '<CC>') ELSE s END AS sc
  FROM s2
)
SELECT doc_id, md5(sc) AS scrubbed_md5, contains(sc, '<CC>') AS cc_scrubbed FROM s3
"""


def pipe_stratified_sample(spark, sf_dir):
    """Stratified sampling: exactly 30 docs per language, ranked by the
    deterministic md5 hash-uniform (stable across reruns, partitionings,
    and engines). The balanced-corpus construction step for mixture
    training."""
    from ..datapipe import sampling

    d = _t(spark, sf_dir, "documents")
    return sampling.stratified_sample(d, "doc_id", "lang", 30).select("doc_id", "lang")


ORACLE_PIPE_STRATIFIED = """
SELECT doc_id, lang FROM (
  SELECT doc_id, lang,
         row_number() OVER (PARTITION BY lang ORDER BY
            CAST(concat('0x', substr(md5(concat('strat:', CAST(doc_id AS VARCHAR))), 1, 8)) AS BIGINT) / 4294967296.0,
            doc_id) AS rn
  FROM documents
) WHERE rn <= 30
"""


def pipe_dataset_card(spark, sf_dir):
    """One-row dataset card: corpus size, token total, language spread,
    exact-duplicate rate (integer ppm), mean document length, dominant
    language + its share — the summary block every dataset release
    ships, composed from the catalog's own building blocks in one pass
    plus a tiny top-1 aggregate."""
    d = _t(spark, sf_dir, "documents")
    stats = d.agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(text.token_count("text").cast("long")).alias("n_tokens"),
        F.countDistinct("lang").alias("n_langs"),
        F.countDistinct(F.md5(F.col("text"))).alias("__uniq"),
        F.sum("n_chars").alias("__chars"),
    )
    top = (
        d.groupBy("lang")
        .agg(F.count(F.lit(1)).alias("__ln"))
        .orderBy(F.col("__ln").desc(), F.col("lang").asc())
        .limit(1)
        .select(F.col("lang").alias("top_lang"), F.col("__ln").alias("__topn"))
    )
    return stats.crossJoin(F.broadcast(top)).select(
        "n_docs",
        "n_tokens",
        "n_langs",
        F.expr("(n_docs - __uniq) * 1000000 div n_docs").alias("dup_ppm"),
        F.round(F.col("__chars").cast("double") / F.col("n_docs").cast("double"), 6).alias("mean_chars"),
        "top_lang",
        F.expr("__topn * 1000000 div n_docs").alias("top_lang_ppm"),
    )


ORACLE_PIPE_DATASET_CARD = """
WITH stats AS (
  SELECT COUNT(*) AS n_docs,
         SUM(CAST(len(list_filter(regexp_split_to_array(text, '\\s+'), x -> x <> '')) AS BIGINT)) AS n_tokens,
         COUNT(DISTINCT lang) AS n_langs,
         COUNT(DISTINCT md5(text)) AS uniq,
         SUM(n_chars) AS chars
  FROM documents
),
top AS (
  SELECT lang AS top_lang, COUNT(*) AS topn
  FROM documents GROUP BY lang
  ORDER BY COUNT(*) DESC, lang ASC LIMIT 1
)
SELECT s.n_docs, CAST(s.n_tokens AS BIGINT) AS n_tokens, s.n_langs,
       (s.n_docs - s.uniq) * 1000000 // s.n_docs AS dup_ppm,
       round(CAST(s.chars AS DOUBLE) / CAST(s.n_docs AS DOUBLE), 6) AS mean_chars,
       t.top_lang,
       t.topn * 1000000 // s.n_docs AS top_lang_ppm
FROM stats s CROSS JOIN top t
"""


def pipe_mixture_weights(spark, sf_dir):
    """Domain-mixture reweighting: per language, the sampling weight that
    moves the corpus to a UNIFORM language mixture (target share /
    actual share) — the knob every multi-domain training recipe sets.
    Shares in exact integer ppm; weights rounded 6."""
    d = _t(spark, sf_dir, "documents")
    per = d.groupBy("lang").agg(F.count(F.lit(1)).alias("n_docs"))
    tot = per.agg(
        F.sum("n_docs").alias("__total"), F.count(F.lit(1)).alias("__k")
    )
    return per.crossJoin(F.broadcast(tot)).select(
        "lang",
        "n_docs",
        F.expr("n_docs * 1000000 div __total").alias("share_ppm"),
        F.round(
            F.col("__total").cast("double")
            / (F.col("__k").cast("double") * F.col("n_docs").cast("double")),
            6,
        ).alias("weight"),
    )


ORACLE_PIPE_MIXTURE = """
WITH per AS (SELECT lang, COUNT(*) AS n_docs FROM documents GROUP BY lang),
tot AS (SELECT SUM(n_docs) AS total, COUNT(*) AS k FROM per)
SELECT p.lang, p.n_docs,
       CAST(p.n_docs * 1000000 // t.total AS BIGINT) AS share_ppm,
       round(CAST(t.total AS DOUBLE) / (CAST(t.k AS DOUBLE) * CAST(p.n_docs AS DOUBLE)), 6) AS weight
FROM per p CROSS JOIN tot t
"""


def pipe_full_pipeline(spark, sf_dir):
    """The WHOLE training-data pipeline as one oracle-checked query:
    quality gate (token count >= 10) -> exact dedup (keep min id per md5)
    -> MinHash-LSH near-dedup over the survivors -> connected components
    -> keep one canonical doc per cluster -> deterministic md5-keyed
    train/val/test split -> per-split doc and token totals. Every stage
    reuses an operator whose oracle already passes standalone; this query
    proves they COMPOSE (each stage consumes the previous stage's actual
    survivors, not the raw table)."""
    from ..datapipe import sampling, text as tx

    from ..checkpoint import checkpoint_df

    d = _t(spark, sf_dir, "documents")
    q = d.where(tx.token_count("text") >= 10)
    # kept1 feeds the minhash pairs, the cluster-assignment node set AND
    # the final semi-join/split — without a checkpoint the quality-gate +
    # exact-dedup corpus pass is planned four times (guide §2.4)
    kept1 = checkpoint_df(
        dedup.exact_dedup(q, "text", "doc_id", keep="min"), eager=False
    )
    pairs = dedup.minhash_lsh_pairs(
        kept1, "doc_id", "text", num_perm=16, bands=4, shingle=8, max_chars=128
    )
    assign = dedup.dedup_clusters(kept1, pairs, id_col="doc_id")
    keepers = assign.where(F.col("cluster_id") == F.col("doc_id")).select("doc_id")
    final = kept1.join(keepers, on="doc_id", how="left_semi")
    split = sampling.train_val_test_split(final, "doc_id", val=0.1, test=0.1)
    return split.groupBy("split").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(tx.token_count("text").cast("long")).alias("n_tokens"),
    )


def _full_pipeline_oracle_sql() -> str:
    mh = _minhash_pairs_cte().replace("FROM documents", "FROM exd")
    return f"""
WITH RECURSIVE qf AS (
  SELECT doc_id, text FROM documents
  WHERE len(list_filter(regexp_split_to_array(text, '\\s+'), x -> x <> '')) >= 10
),
ex AS (SELECT MIN(doc_id) AS doc_id FROM qf GROUP BY md5(text)),
exd AS (SELECT q.doc_id, q.text FROM qf q JOIN ex ON ex.doc_id = q.doc_id),
{mh},
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
best AS (SELECT node, MIN(label) AS cl FROM cc GROUP BY node),
final AS (
  SELECT d.doc_id, d.text FROM exd d LEFT JOIN best ON d.doc_id = best.node
  WHERE COALESCE(best.cl, d.doc_id) = d.doc_id
),
labeled AS (
  SELECT doc_id, text,
         CASE WHEN su < 0.1 THEN 'val' WHEN su < 0.2 THEN 'test'
              ELSE 'train' END AS split
  FROM (
    SELECT *, CAST(concat('0x', substr(md5(concat('split:', CAST(doc_id AS VARCHAR))), 1, 8)) AS BIGINT) / 4294967296.0 AS su
    FROM final
  )
)
SELECT split, COUNT(*) AS n_docs,
       CAST(SUM(CAST(len(list_filter(regexp_split_to_array(text, '\\s+'), x -> x <> '')) AS BIGINT)) AS BIGINT) AS n_tokens
FROM labeled GROUP BY split
"""


ORACLE_PIPE_FULL = _full_pipeline_oracle_sql()


def pipe_weighted_sample(spark, sf_dir):
    """Quality-weighted corpus subsampling (Efraimidis-Spirakis
    u^(1/w) top-k): longer documents (weight = word count) are
    proportionally more likely to survive; selection is deterministic,
    engine-independent (score rounded to 9 dp, ties by doc_id), and
    distributed (TakeOrderedAndProject, no global sort)."""
    from ..datapipe import sampling

    d = _t(spark, sf_dir, "documents")
    w = F.size(F.split(F.col("text"), " ")).cast("double")
    out = sampling.weighted_sample(d, "doc_id", w, k=50)
    return out.select("doc_id", F.col("__wscore").alias("score"))


ORACLE_PIPE_WEIGHTED = """
WITH scored AS (
  SELECT doc_id,
         round(pow(
           CAST(concat('0x', substr(md5(concat('wsample:', CAST(doc_id AS VARCHAR))), 1, 8)) AS BIGINT) / 4294967296.0,
           1.0 / CAST(len(string_split(text, ' ')) AS DOUBLE)
         ), 9) AS score
  FROM documents
),
ranked AS (
  SELECT doc_id, score,
         ROW_NUMBER() OVER (ORDER BY score DESC, doc_id) AS rn
  FROM scored
)
SELECT doc_id, score FROM ranked WHERE rn <= 50
"""


def pipe_mixture_plan(spark, sf_dir):
    """Domain-mixture planning (Pile/LLaMA-style data mixing): documents
    bucketed into four synthetic domains, target weights
    web .5 / books .2 / code .2 / wiki .1 against a 500k-token budget,
    epochs capped at 4; per-document copy counts drawn with the
    deterministic md5 uniform. Aggregated per domain: document count,
    planned epochs, total copies, realized token count — all exactly
    mirrored in SQL."""
    from ..datapipe import sampling, text

    d = _t(spark, sf_dir, "documents")
    dom = (
        F.when(F.col("doc_id") % 4 == 0, "web")
        .when(F.col("doc_id") % 4 == 1, "books")
        .when(F.col("doc_id") % 4 == 2, "code")
        .otherwise("wiki")
    )
    toks = d.select(
        "doc_id", dom.alias("domain"),
        text.token_count("text").cast("long").alias("n_tok"),
    )
    planned = sampling.mixture_plan(
        toks,
        "domain",
        weights={"web": 0.5, "books": 0.2, "code": 0.2, "wiki": 0.1},
        budget_tokens=500_000,
        token_count_col="n_tok",
        key="doc_id",
        max_repeat=4.0,
    )
    return planned.groupBy("domain").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.min("epochs").alias("epochs"),
        F.sum("n_copies").alias("n_copies_total"),
        F.sum(F.col("n_copies") * F.col("n_tok")).alias("realized_tokens"),
    )


def pipe_domain_cap(spark, sf_dir):
    """Per-domain frequency cap (sampling.domain_cap; the FineWeb-style
    "no domain contributes more than N docs" step): top 15 documents per
    source by n_chars, doc_id tie-break. One shuffle keyed on the domain;
    the oracle is the same ROW_NUMBER window."""
    from ..datapipe.sampling import domain_cap

    d = _t(spark, sf_dir, "documents")
    kept = domain_cap(d, "source", "n_chars", 15, key_col="doc_id")
    return kept.select("doc_id", "source", "n_chars")


ORACLE_PIPE_DOMAIN_CAP = """
SELECT doc_id, source, n_chars
FROM (
  SELECT doc_id, source, n_chars,
         ROW_NUMBER() OVER (PARTITION BY source
                            ORDER BY n_chars DESC, doc_id ASC) AS rn
  FROM documents
)
WHERE rn <= 15
"""


def pipe_budget_fill(spark, sf_dir):
    """Quality-first budget fill (FineWeb-style curation) without a
    per-domain sort: score-histogram threshold + deterministic fractional
    admission inside the threshold bucket (sampling.budget_fill). Four
    synthetic domains, 60k-token budget each, 1000 score buckets.
    Aggregated per domain; the DuckDB oracle replays the identical
    histogram/window/threshold arithmetic."""
    from ..datapipe import sampling, text

    d = _t(spark, sf_dir, "documents")
    dom = (
        F.when(F.col("doc_id") % 4 == 0, "web")
        .when(F.col("doc_id") % 4 == 1, "books")
        .when(F.col("doc_id") % 4 == 2, "code")
        .otherwise("wiki")
    )
    toks = d.select(
        "doc_id", dom.alias("domain"),
        text.token_count("text").cast("long").alias("n_tok"),
        F.round(text.quality_score("text"), 6).alias("q"),
    )
    out = sampling.budget_fill(
        toks, "domain", "n_tok", "q",
        budget_tokens=60_000, n_buckets=1000, key="doc_id",
    )
    return out.groupBy("domain").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(F.col("selected").cast("long")).alias("n_selected"),
        F.sum("n_tok").alias("tokens_total"),
        F.sum(F.when(F.col("selected"), F.col("n_tok")).otherwise(0)).alias(
            "tokens_selected"
        ),
    )


_Q6_SQL = """round(LEAST(GREATEST(
         (CASE WHEN length(text) > 0
               THEN CAST(length(regexp_replace(text, '[^A-Za-z]', '', 'g')) AS DOUBLE) / CAST(length(text) AS DOUBLE)
               ELSE 0.0 END) * 0.6
         + (1.0 - (CASE WHEN length(text) > 0
               THEN CAST(length(regexp_replace(text, '[^0-9]', '', 'g')) AS DOUBLE) / CAST(length(text) AS DOUBLE)
               ELSE 0.0 END)) * 0.2
         + (CASE WHEN (CASE WHEN len(list_filter(regexp_split_to_array(text, '\\s+'), x -> x <> '')) > 0
               THEN CAST(list_sum(list_transform(list_filter(regexp_split_to_array(text, '\\s+'), x -> x <> ''), x -> length(x))) AS DOUBLE)
                    / CAST(len(list_filter(regexp_split_to_array(text, '\\s+'), x -> x <> '')) AS DOUBLE)
               ELSE 0.0 END) BETWEEN 3.0 AND 10.0 THEN 1.0 ELSE 0.5 END) * 0.2
         , 0.0), 1.0), 6)"""


ORACLE_PIPE_BUDGET_FILL = f"""
WITH toks AS (
  SELECT doc_id,
         CASE CAST(doc_id % 4 AS INT) WHEN 0 THEN 'web' WHEN 1 THEN 'books'
              WHEN 2 THEN 'code' ELSE 'wiki' END AS domain,
         CAST(len(list_filter(regexp_split_to_array(text, '\\s+'), x -> x <> '')) AS BIGINT) AS n_tok,
         {_Q6_SQL} AS q
  FROM documents
), rows_b AS (
  SELECT doc_id, domain, n_tok,
         LEAST(CAST(floor(q * 1000.0) AS BIGINT), 999) AS bucket
  FROM toks
), hist AS (
  SELECT domain, bucket, SUM(n_tok) AS btok
  FROM rows_b GROUP BY domain, bucket
), cum AS (
  SELECT domain, bucket, btok,
         SUM(btok) OVER (PARTITION BY domain ORDER BY bucket DESC
                         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS c
  FROM hist
), plan AS (
  SELECT cum.domain, cum.bucket AS tb,
         round((CAST(60000.0 AS DOUBLE) - CAST(c - btok AS DOUBLE))
               / CAST(btok AS DOUBLE), 8) AS rate
  FROM cum
  JOIN (SELECT domain, MAX(bucket) AS tb FROM cum WHERE c >= 60000
        GROUP BY domain) t
    ON cum.domain = t.domain AND cum.bucket = t.tb
), perdoc AS (
  SELECT r.domain, r.n_tok,
         CASE WHEN p.tb IS NULL THEN TRUE
              WHEN r.bucket > p.tb THEN TRUE
              WHEN r.bucket = p.tb
                   AND CAST(concat('0x', substr(md5(concat('fill:', CAST(r.doc_id AS VARCHAR))), 1, 8)) AS BIGINT) / 4294967296.0 < p.rate
                   THEN TRUE
              ELSE FALSE END AS selected
  FROM rows_b r LEFT JOIN plan p ON r.domain = p.domain
)
SELECT domain, COUNT(*) AS n_docs,
       CAST(SUM(CASE WHEN selected THEN 1 ELSE 0 END) AS BIGINT) AS n_selected,
       CAST(SUM(n_tok) AS BIGINT) AS tokens_total,
       CAST(SUM(CASE WHEN selected THEN n_tok ELSE 0 END) AS BIGINT) AS tokens_selected
FROM perdoc GROUP BY domain
"""


ORACLE_PIPE_MIXTURE_PLAN = """
WITH toks AS (
  SELECT doc_id,
         CASE CAST(doc_id % 4 AS INT) WHEN 0 THEN 'web' WHEN 1 THEN 'books'
              WHEN 2 THEN 'code' ELSE 'wiki' END AS domain,
         CAST(len(list_filter(regexp_split_to_array(text, '\\s+'), x -> x <> '')) AS BIGINT) AS n_tok
  FROM documents
), avail AS (
  SELECT domain, SUM(n_tok) AS avail FROM toks GROUP BY domain
), plan AS (
  SELECT domain,
         round(least(
           CASE domain WHEN 'web' THEN CAST(0.5 AS DOUBLE)
                WHEN 'books' THEN CAST(0.2 AS DOUBLE)
                WHEN 'code' THEN CAST(0.2 AS DOUBLE)
                ELSE CAST(0.1 AS DOUBLE) END
           * CAST(500000.0 AS DOUBLE) / CAST(avail AS DOUBLE),
           CAST(4.0 AS DOUBLE)), 8) AS epochs
  FROM avail
), perdoc AS (
  SELECT t.doc_id, t.domain, t.n_tok, p.epochs,
         CAST(floor(p.epochs) AS BIGINT)
         + CASE WHEN CAST(concat('0x', substr(md5(concat('mix:', CAST(t.doc_id AS VARCHAR))), 1, 8)) AS BIGINT) / 4294967296.0
                     < round(p.epochs - floor(p.epochs), 8)
                THEN 1 ELSE 0 END AS n_copies
  FROM toks t JOIN plan p USING (domain)
)
SELECT domain, COUNT(*) AS n_docs, MIN(epochs) AS epochs,
       CAST(SUM(n_copies) AS BIGINT) AS n_copies_total,
       CAST(SUM(n_copies * n_tok) AS BIGINT) AS realized_tokens
FROM perdoc GROUP BY domain
"""


def pipe_decontaminate(spark, sf_dir):
    """Benchmark decontamination: every 23rd doc is the held-out eval set;
    flag training docs whose distinct word-3-gram overlap with it exceeds
    5% (exact integer ppm — no float rounding anywhere)."""
    from ..datapipe import corpus

    docs = _t(spark, sf_dir, "documents")
    bench = docs.where(F.col("doc_id") % 23 == 0)
    corp = docs.where(F.col("doc_id") % 23 != 0)
    return corpus.decontaminate(corp, bench, n=3, threshold_ppm=50000)


ORACLE_DECONTAM = f"""
WITH corp AS (
  SELECT doc_id, list_distinct({_NG3}) AS gs
  FROM (SELECT doc_id, string_split(text, ' ') AS ws
        FROM documents WHERE doc_id % 23 <> 0)
),
bench AS (
  SELECT DISTINCT unnest({_NG3}) AS g
  FROM (SELECT string_split(text, ' ') AS ws
        FROM documents WHERE doc_id % 23 = 0)
),
ex AS (SELECT doc_id, unnest(gs) AS g FROM corp),
hits AS (
  SELECT e.doc_id, COUNT(b.g) AS n_hits
  FROM ex e LEFT JOIN bench b ON e.g = b.g GROUP BY e.doc_id
)
SELECT c.doc_id,
       CAST(len(c.gs) AS BIGINT) AS n_grams,
       CAST(COALESCE(h.n_hits, 0) AS BIGINT) AS n_hits,
       CASE WHEN len(c.gs) > 0
            THEN CAST(COALESCE(h.n_hits, 0) * 1000000 // len(c.gs) AS BIGINT)
            ELSE CAST(0 AS BIGINT) END AS overlap_ppm,
       COALESCE(h.n_hits, 0) * 1000000 > 50000 * len(c.gs) AS contaminated
FROM corp c LEFT JOIN hits h ON c.doc_id = h.doc_id
"""


def pipe_pack_bins(spark, sf_dir):
    """Greedy sequence packing into 2048-token training bins, sharded 8
    ways so the packing window parallelizes; per-bin integer fill stats."""
    from ..datapipe import corpus

    docs = _t(spark, sf_dir, "documents")
    packed = corpus.pack_sequences(docs, target_tokens=2048, n_shards=8)
    return packed.groupBy("shard", "bin").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_tokens").alias("bin_tokens"),
    )


ORACLE_PACK = """
WITH toks AS (
  SELECT doc_id, doc_id % 8 AS shard,
         CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens
  FROM documents
),
packed AS (
  SELECT shard, doc_id, n_tokens,
         CAST(floor(CAST(SUM(n_tokens) OVER (
             PARTITION BY shard ORDER BY doc_id
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - n_tokens
           AS DOUBLE) / 2048.0) AS BIGINT) AS bin
  FROM toks
)
SELECT shard, bin, CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(n_tokens) AS BIGINT) AS bin_tokens
FROM packed GROUP BY shard, bin
"""
