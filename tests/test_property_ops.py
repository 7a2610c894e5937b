"""Property tests for the round-4 pipeline operators: each checked
against an independent brute-force referee on seeded random inputs
(the same exactness-vs-brute-force strategy as test_fuzzy.py)."""

import math
import random
from collections import defaultdict
from decimal import ROUND_HALF_UP, Decimal

from pyspark.sql import Row, functions as F


def _r8(x: float) -> float:
    """Spark round(double, 8) replica (shortest-repr HALF_UP)."""
    return float(Decimal(repr(float(x))).quantize(Decimal("1E-8"),
                                                  rounding=ROUND_HALF_UP))


def _cos(a, b):
    dot = na = nb = 0.0
    for x, y in zip(a, b):
        dot += x * y
        na += x * x
        nb += y * y
    den = math.sqrt(na) * math.sqrt(nb)
    return dot / den if den > 0 else 0.0


def _naive_mmr(cands, k, lam):
    """Brute-force greedy MMR per query: O(k n^2) rescan (no running max,
    no norm cache — a genuinely different code path from the library's
    local fast path). Integer-tick scoring mirrors the documented
    semantics."""
    lam_i = int(round(lam * 1000))
    byq = defaultdict(list)
    for qid, cid, rel, vec in cands:
        byq[qid].append((cid, _r8(rel), vec))
    out = {}
    for qid, rows in byq.items():
        reli = {cid: int(round(r8 * 1e8)) for cid, r8, _ in rows}
        vecs = {cid: v for cid, _, v in rows}
        sel = []
        first = sorted(rows, key=lambda r: (-reli[r[0]], r[0]))[0][0]
        sel.append(first)
        for _ in range(2, k + 1):
            best = None
            for cid, _, _ in rows:
                if cid in sel:
                    continue
                msi = max(
                    int(round(_r8(_cos(vecs[cid], vecs[s])) * 1e8))
                    for s in sel
                )
                scorei = lam_i * reli[cid] - (1000 - lam_i) * msi
                key = (-scorei, cid)
                if best is None or key < best[0]:
                    best = (key, cid)
            if best is None:
                break
            sel.append(best[1])
        out[qid] = sel
    return out


def test_mmr_matches_naive_greedy_on_random_candidates(spark):
    """120 random queries with candidate sets of size 1..9 (several below
    k), random relevances and 8-dim vectors: the library's pick sequence
    equals the brute-force greedy referee for every query."""
    from geoarrow_rs_spark.datapipe.similarity import mmr_rerank

    rng = random.Random(11)
    cands = []
    for q in range(120):
        for c in range(rng.randint(1, 9)):
            vec = [rng.uniform(-1, 1) for _ in range(8)]
            cands.append((q, 1000 + c, rng.uniform(-0.2, 1.0), vec))
    df = spark.createDataFrame(
        [Row(query_id=q, neighbor_id=c, rel=r, vec=v) for q, c, r, v in cands]
    )
    got = defaultdict(dict)
    for r in mmr_rerank(df, k=3, lam=0.7).collect():
        got[r["query_id"]][r["mmr_rank"]] = r["neighbor_id"]
    want = _naive_mmr(cands, k=3, lam=0.7)
    for q, sel in want.items():
        assert [got[q][i + 1] for i in range(len(sel))] == sel, q


def test_budget_fill_is_monotone_in_budget(spark):
    """Growing the token budget can only ADD selected documents, never
    remove one (the threshold bucket moves down; admission rates grow)."""
    from geoarrow_rs_spark.datapipe.sampling import budget_fill

    rng = random.Random(7)
    rows = [
        Row(doc_id=i, domain=rng.choice(["a", "b", "c"]),
            n_tok=rng.randint(1, 400),
            q=round(rng.random(), 6))
        for i in range(600)
    ]
    df = spark.createDataFrame(rows)
    prev = None
    for budget in (2_000, 8_000, 20_000, 60_000):
        sel = {
            r["doc_id"]
            for r in budget_fill(df, "domain", "n_tok", "q", budget).collect()
            if r["selected"]
        }
        if prev is not None:
            assert prev <= sel, f"budget {budget} dropped {prev - sel}"
        prev = sel


def test_mixture_plan_copy_counts_bracket_epochs(spark):
    """For every row: n_copies is floor(epochs) or floor(epochs)+1, and
    epochs never exceeds the repeat cap — across random weights/budgets."""
    from geoarrow_rs_spark.datapipe.sampling import mixture_plan

    rng = random.Random(3)
    rows = [
        Row(doc_id=i, domain=rng.choice(["w", "x", "y", "z"]),
            n_tok=rng.randint(1, 300))
        for i in range(500)
    ]
    df = spark.createDataFrame(rows)
    for seed in range(3):
        r2 = random.Random(seed)
        ws = {d: r2.random() for d in ("w", "x", "y")}  # 'z' unweighted
        tot = sum(ws.values())
        ws = {d: w / tot for d, w in ws.items()}
        out = mixture_plan(
            df, "domain", ws, budget_tokens=r2.randint(10_000, 200_000),
            token_count_col="n_tok", max_repeat=3.0,
        ).collect()
        for r in out:
            lo = math.floor(r["epochs"])
            assert r["n_copies"] in (lo, lo + 1), r
            assert 0.0 <= r["epochs"] <= 3.0
            if r["domain"] == "z":
                assert r["epochs"] == 0.0 and r["n_copies"] == 0


def test_cms_never_underestimates_under_heavy_collision(spark):
    """Adversarial sketch size (width 16, depth 2) on a 400-token corpus
    with a 60-word vocabulary: every estimate >= its exact count."""
    from geoarrow_rs_spark.datapipe.sketch import cms_build, cms_estimate

    rng = random.Random(5)
    vocab = [f"w{i}" for i in range(60)]
    toks = spark.createDataFrame(
        [Row(token=rng.choice(vocab)) for _ in range(400)]
    )
    sk = cms_build(toks, "token", depth=2, width=16)
    exact = toks.groupBy("token").agg(F.count(F.lit(1)).alias("exact"))
    est = cms_estimate(sk, exact.select("token"), "token", depth=2, width=16)
    bad = exact.join(est, "token").where(
        F.col("cms_count") < F.col("exact")
    )
    assert bad.count() == 0


def test_neighborhood_function_matches_bfs_on_random_graphs(spark):
    """Random sparse graphs (seeded): with k above every component size
    the sketches never saturate, so ball sizes and harmonic centrality
    equal an independent BFS referee exactly."""
    from geoarrow_rs_spark.datapipe.graph import neighborhood_function

    rng = random.Random(23)
    edges = set()
    for _ in range(60):
        a, b = rng.randrange(40), rng.randrange(40)
        if a != b:
            edges.add((min(a, b), max(a, b)))
    adj = defaultdict(set)
    for a, b in edges:
        adj[a].add(b)
        adj[b].add(a)

    def bfs_balls(u, hops):
        seen = {u}
        frontier = {u}
        sizes = []
        for _ in range(hops):
            frontier = {w for v in frontier for w in adj[v]} - seen
            seen |= frontier
            sizes.append(len(seen))
        return sizes

    df = spark.createDataFrame([Row(a_id=a, b_id=b) for a, b in edges])
    got = {r["node"]: r for r in
           neighborhood_function(df, k=64, hops=3).collect()}
    for u in adj:
        s = bfs_balls(u, 3)
        assert (got[u]["n1"], got[u]["n2"], got[u]["n3"]) == tuple(
            float(x) for x in s
        ), u
        harm = (s[0] - 1) + (s[1] - s[0]) / 2 + (s[2] - s[1]) / 3
        assert abs(got[u]["harmonic"] - harm) < 1e-9, u


def test_triangle_count_matches_brute_force_on_random_graphs(spark):
    """Random graphs vs an O(n^3) brute-force triangle referee: per-node
    counts agree exactly."""
    from geoarrow_rs_spark.datapipe.graph import triangle_count

    rng = random.Random(31)
    n = 25
    edges = {
        (a, b)
        for a in range(n) for b in range(a + 1, n)
        if rng.random() < 0.25
    }
    adj = defaultdict(set)
    for a, b in edges:
        adj[a].add(b)
        adj[b].add(a)
    want = defaultdict(int)
    for a in range(n):
        for b in range(a + 1, n):
            if b not in adj[a]:
                continue
            for c in range(b + 1, n):
                if c in adj[a] and c in adj[b]:
                    for v in (a, b, c):
                        want[v] += 1
    df = spark.createDataFrame([Row(a_id=a, b_id=b) for a, b in edges])
    got = {r["node"]: r["tri_count"] for r in triangle_count(df).collect()}
    assert got == {v: c for v, c in want.items() if c > 0}
