"""Query-side retrieval operators: BM25, RRF fusion, PageRank, semantic
similarity edges, temporal snapshots, keyword extraction.

All reference parity targets are cited per function (paths into
/root/reference). Hot paths are built-in ``pyspark.sql.functions``
(JVM-side); the only driver-side values are global scalars (N, avgdl) and
the PageRank convergence check.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

# graphrag-rs retrieval/bm25.rs:212-225 — the 100-word list used by the
# BM25 tokenizer
BM25_STOPWORDS = (
    "the", "be", "to", "of", "and", "a", "in", "that", "have", "i", "it",
    "for", "not", "on", "with", "he", "as", "you", "do", "at", "this", "but",
    "his", "by", "from", "they", "we", "say", "her", "she", "or", "an",
    "will", "my", "one", "all", "would", "there", "their", "what", "so",
    "up", "out", "if", "about", "who", "get", "which", "go", "me", "when",
    "make", "can", "like", "time", "no", "just", "him", "know", "take",
    "people", "into", "year", "your", "good", "some", "could", "them",
    "see", "other", "than", "then", "now", "look", "only", "come", "its",
    "over", "think", "also", "back", "after", "use", "two", "how", "our",
    "work", "first", "well", "way", "even", "new", "want", "because",
    "any", "these", "give", "day", "most", "us",
)

# graphrag-rs text/mod.rs:484-498 — the 50-word list used by
# extract_keywords (a strict prefix of the BM25 list)
KEYWORD_STOPWORDS = BM25_STOPWORDS[:50]

# graphrag-rs text/keyword_extraction.rs:124-141 — the BM25 list plus verb
# forms, used by the TF-IDF extractor
TFIDF_STOPWORDS = BM25_STOPWORDS + (
    "is", "was", "are", "been", "has", "had", "were", "said", "did",
)


def bm25_tokens_col(text: Column) -> Column:
    """The reference tokenizer (bm25.rs:198-209): lowercase → whitespace
    split → strip non-alphanumeric chars per token → keep len > 2 and
    non-stopword."""
    toks = F.split(F.lower(F.trim(text)), r"\s+")
    cleaned = F.transform(toks, lambda t: F.regexp_replace(t, r"[^a-z0-9]", ""))
    return F.filter(
        cleaned, lambda t: (F.length(t) > 2) & ~t.isin(*BM25_STOPWORDS)
    )


def bm25_tokenize(text: str) -> list[str]:
    """Python twin of :func:`bm25_tokens_col` for query strings."""
    out = []
    for tok in text.lower().split():
        tok = "".join(c for c in tok if c.isalnum())
        if len(tok) > 2 and tok not in BM25_STOPWORDS:
            out.append(tok)
    return out


def bm25_scores(
    docs: DataFrame,
    query: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    k1: float = 1.2,
    b: float = 0.75,
    limit: int = 10,
) -> DataFrame:
    """BM25 top-``limit`` (bm25.rs:117-192 semantics, exactly):

    * tf is NORMALIZED term frequency ``count/doc_len`` (bm25.rs:88-96)
    * idf is Lucene-style ``ln(N/df) + 1`` (bm25.rs:171-181)
    * term score = ``idf · tf(k1+1)/(tf + k1(1-b+b·dl/avgdl))`` (bm25.rs:184-190)
    * doc score = Σ over query terms; sort score desc (tie: id asc —
      deterministic stand-in for the reference's unstable partial_cmp sort)

    Distributed shape: one narrow tokenize pass; term stats via two
    aggregations; the query-term filter happens BEFORE the shuffle so only
    matching postings move. N and avgdl are two driver scalars (one tiny
    ``agg`` job), not a collect of data rows.
    """
    toks = docs.select(
        F.col(id_col), bm25_tokens_col(F.col(text_col)).alias("toks")
    ).withColumn("dl", F.size("toks"))

    stats = toks.agg(
        F.count(F.lit(1)).alias("n"), F.avg("dl").alias("avgdl")
    ).collect()[0]
    n_docs, avgdl = int(stats["n"]), float(stats["avgdl"] or 0.0)
    if n_docs == 0:
        # keep the INPUT's id type (a hardcoded long diverged from the
        # string-id schema every non-empty call returns, breaking
        # downstream unions/joins on the empty-corpus edge)
        id_type = dict(docs.dtypes)[id_col]
        return docs.sparkSession.createDataFrame(
            [], f"{id_col} {id_type}, score double"
        )

    qterms = list(dict.fromkeys(bm25_tokenize(query)))
    postings = (
        toks.select(F.col(id_col), "dl", F.explode("toks").alias("term"))
        .where(F.col("term").isin(qterms))
        .groupBy(id_col, "dl", "term")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .withColumn("tf", F.col("cnt").cast("double") / F.col("dl"))
    )
    doc_freq = postings.groupBy("term").agg(
        F.count_distinct(F.col(id_col)).alias("df")
    )
    idf = F.log(F.lit(float(n_docs)) / F.col("df")) + F.lit(1.0)
    term_score = idf * (
        F.col("tf") * F.lit(k1 + 1.0)
        / (F.col("tf") + F.lit(k1) * (1.0 - b + b * F.col("dl") / F.lit(avgdl)))
    )
    scored = (
        postings.join(F.broadcast(doc_freq), "term")
        .withColumn("ts", term_score)
        .groupBy(id_col)
        .agg(F.sum("ts").alias("score"))
    )
    return scored.orderBy(F.desc("score"), F.asc(id_col)).limit(limit)


def rrf_fuse(ranked: DataFrame, k: int = 60) -> DataFrame:
    """Reciprocal-rank fusion ``score = Σ 1/(k + rank)`` over rows
    (list_id, item_id, rank) — retrieval/hybrid.rs formula
    (HOW_IT_WORKS.md:870-886), k=60 default."""
    return ranked.groupBy("item_id").agg(
        F.sum(F.lit(1.0) / (F.lit(float(k)) + F.col("rank").cast("double"))).alias(
            "rrf_score"
        ),
        F.count(F.lit(1)).alias("n_lists"),
    )


def hybrid_search(
    docs: DataFrame,
    query: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    k_each: int = 20,
    rrf_k: int = 60,
    top_n: int = 10,
    dim: int = 32,
) -> DataFrame:
    """One-call hybrid retrieval (graphrag-rs retrieval/hybrid.rs:168;
    fusion formula HOW_IT_WORKS.md:870-886): BM25 top-``k_each`` and
    hash-embedding cosine top-``k_each`` fused with RRF (k=``rrf_k``),
    returning the top ``top_n`` (item_id, rrf_score, n_lists).

    Distributed shape: both branches are narrow scans over the same doc
    table (BM25's postings shuffle + the embedding UDF); the query vector
    is a driver-computed literal (one embed call, no collect of data
    rows); fusion is a two-list union + groupBy.
    """
    from graphrag_rs_spark.functions import cosine_similarity_col
    from graphrag_rs_spark.functions.embeddings import add_embeddings, embed_text

    bm = bm25_scores(docs, query, id_col=id_col, text_col=text_col, limit=k_each)
    w_bm = Window.orderBy(F.desc("score"), F.asc(id_col))
    bm_ranked = bm.select(
        F.lit("bm25").alias("list_id"),
        F.col(id_col).alias("item_id"),
        F.row_number().over(w_bm).alias("rank"),
    )

    qvec = [float(x) for x in embed_text(query, dim)]
    embedded = add_embeddings(docs, text_col=text_col, dim=dim)
    scored = embedded.select(
        F.col(id_col),
        cosine_similarity_col(
            F.col("embedding").cast("array<double>"),
            F.array(*[F.lit(x) for x in qvec]),
        ).alias("cosine"),
    )
    # top-k via orderBy+limit (TakeOrderedAndProject — distributed
    # per-partition heaps), NOT a row_number over an unpartitioned
    # Window, which would funnel the whole scored corpus through one
    # task; the rank window then runs over only k_each rows
    topk = scored.orderBy(F.desc("cosine"), F.asc(id_col)).limit(k_each)
    w_knn = Window.orderBy(F.desc("cosine"), F.asc(id_col))
    knn_ranked = topk.select(
        F.lit("vector").alias("list_id"),
        F.col(id_col).alias("item_id"),
        F.row_number().over(w_knn).alias("rank"),
    )

    fused = rrf_fuse(bm_ranked.unionByName(knn_ranked), k=rrf_k)
    return fused.orderBy(F.desc("rrf_score"), F.asc("item_id")).limit(top_n)


def _local_pagerank(
    e: DataFrame,
    damping: float,
    max_iter: int,
    tol: float,
    personalization: DataFrame | None,
    check_every: int,
) -> DataFrame:
    """Single-process power iteration over a collected (bounded) edge list.

    Runs the IDENTICAL update rule and convergence schedule as the
    distributed path in :func:`pagerank` — same teleport construction
    (uniform / seed-set / weighted, including the reference's
    seeds-counted-before-graph-intersection quirk), same dangling-mass
    fold through the teleport vector, same every-``check_every`` L1 delta
    check — so the two paths agree up to float-summation order.
    """
    from collections import defaultdict

    spark = e.sparkSession
    rows = e.collect()
    if not rows:
        return spark.createDataFrame([], "id string, rank double")
    out_nbrs: dict = defaultdict(list)
    node_set: set = set()
    for u, v in rows:
        out_nbrs[u].append(v)
        node_set.add(u)
        node_set.add(v)
    nodes = sorted(node_set, key=lambda x: (x is None, x))  # null-safe order
    n = len(nodes)
    outd = {u: len(vs) for u, vs in out_nbrs.items()}
    dangling = [i for i in nodes if i not in outd]

    if personalization is not None:
        if "weight" in personalization.columns:
            w = {
                r["id"]: float(r["weight"] or 0.0)
                for r in personalization.select("id", "weight").collect()
                if r["id"] in node_set
            }
            total = sum(w.values())
            if total > 0:
                tp = {i: w.get(i, 0.0) / total for i in nodes}
            else:
                tp = {i: 1.0 / n for i in nodes}
        else:
            seed_rows = [r[0] for r in personalization.select("id").collect()]
            # the distributed path counts ALL personalization rows (before
            # intersecting with the graph) for the 1/n_seeds mass
            share = 1.0 / max(len(seed_rows), 1)
            seed_set = set(seed_rows)
            tp = {i: (share if i in seed_set else 0.0) for i in nodes}
    else:
        tp = {i: 1.0 / n for i in nodes}

    ranks = dict(tp)
    for it in range(max_iter):
        inflow: dict = defaultdict(float)
        for u, vs in out_nbrs.items():
            c = ranks[u] / outd[u]
            for v in vs:
                inflow[v] += c
        dmass = sum(ranks[i] for i in dangling)
        new_ranks = {
            i: (1.0 - damping) * tp[i]
            + damping * (inflow.get(i, 0.0) + dmass * tp[i])
            for i in nodes
        }
        if (it + 1) % check_every == 0 or it == max_iter - 1:
            delta = sum(abs(new_ranks[i] - ranks[i]) for i in nodes)
            ranks = new_ranks
            if delta < tol:
                break
        else:
            ranks = new_ranks

    from pyspark.sql.types import DoubleType, StructField, StructType

    id_type = e.schema["u"].dataType
    schema = StructType(
        [StructField("id", id_type), StructField("rank", DoubleType())]
    )
    return spark.createDataFrame(
        [(i, float(ranks[i])) for i in nodes], schema
    )


def pagerank(
    edges: DataFrame,
    src: str = "subj",
    dst: str = "obj",
    damping: float = 0.85,
    max_iter: int = 20,
    tol: float = 1.0e-6,
    personalization: DataFrame | None = None,
    check_every: int = 5,
    strategy: str = "auto",
    local_threshold: int = 50_000,
) -> DataFrame:
    """(Personalized) PageRank by power iteration (graph/pagerank.rs:182-300
    semantics: damping 0.85, tol 1e-6, uniform-or-seeded teleport, dangling
    mass redistributed via the teleport vector).

    Iterative DataFrame joins; ONE Spark action per iteration: the dangling
    node set is precomputed once, the dangling-mass scalar rides along as a
    1-row DataFrame cross-join (never collected), and the convergence delta
    is checked only every ``check_every`` iterations — per-job scheduling
    latency, not compute, dominates iterative graph algorithms on all but
    the largest graphs.

    ``strategy`` (same pattern as :func:`~graphrag_rs_spark.operators.graph.
    connected_components`): ``auto`` runs a single-task in-memory power
    iteration when the distinct edge list is at most ``local_threshold``
    rows (30 iterations on a toy graph otherwise cost 30 jobs of pure
    scheduling latency — the bounded collect mirrors CC's local path), and
    the iterative-DataFrame path above it; ``local`` / ``distributed``
    force a path. Both paths run the identical update (same teleport,
    dangling fold, and every-``check_every`` convergence schedule), so
    they agree to float-sum reordering (~1e-15 at these sizes).
    """
    spark = edges.sparkSession
    e = edges.select(F.col(src).alias("u"), F.col(dst).alias("v")).distinct()
    if personalization is not None and "weight" in personalization.columns:
        # pre-aggregate duplicate seed ids BEFORE dispatching: the local
        # path's dict would otherwise keep the last weight while the
        # distributed path's left join would duplicate node rows and
        # double-count mass — summing per id makes both paths identical
        # and well-defined for any input
        personalization = personalization.groupBy("id").agg(
            F.sum("weight").alias("weight")
        )
    if strategy == "local" or (
        strategy == "auto" and e.count() <= local_threshold
    ):
        return _local_pagerank(
            e, damping, max_iter, tol, personalization, check_every
        )
    if strategy not in ("auto", "distributed"):
        raise ValueError(
            f"unknown pagerank strategy {strategy!r}: "
            "'auto' | 'local' | 'distributed'"
        )
    nodes = e.select(F.col("u").alias("id")).union(
        e.select(F.col("v").alias("id"))
    ).distinct().localCheckpoint(eager=True)
    n = nodes.count()
    if n == 0:
        return spark.createDataFrame([], "id string, rank double")

    out_deg = e.groupBy("u").agg(F.count(F.lit(1)).alias("outd"))

    if personalization is not None:
        if "weight" in personalization.columns:
            # weighted reset distribution (HippoRAG-style): normalize the
            # provided weights over the nodes that exist in the graph
            seeds = nodes.join(
                personalization.select("id", "weight"), "id", "left"
            ).select("id", F.coalesce("weight", F.lit(0.0)).alias("w"))
            total = seeds.agg(F.sum("w").alias("t"))
            teleport = seeds.crossJoin(F.broadcast(total)).select(
                "id",
                F.when(F.col("t") > 0, F.col("w") / F.col("t"))
                .otherwise(F.lit(1.0 / n))
                .alias("tp"),
            )
        else:
            seeds = personalization.select(F.col("id"))
            n_seeds = seeds.count()
            teleport = nodes.join(seeds, "id", "left_semi").withColumn(
                "tp", F.lit(1.0 / max(n_seeds, 1))
            )
            teleport = nodes.join(teleport.select("id", "tp"), "id", "left").select(
                "id", F.coalesce("tp", F.lit(0.0)).alias("tp")
            )
    else:
        teleport = nodes.withColumn("tp", F.lit(1.0 / n))
    # precompute the dangling flag once; it never changes across iterations
    teleport = teleport.join(
        out_deg.select(F.col("u").alias("id"), F.lit(False).alias("_nd")),
        "id",
        "left",
    ).select(
        "id", "tp", F.coalesce("_nd", F.lit(True)).alias("dangling")
    ).localCheckpoint(eager=True)

    ranks = teleport.select("id", F.col("tp").alias("rank"))
    edges_d = e.join(out_deg, "u").localCheckpoint(eager=True)

    for it in range(max_iter):
        contribs = (
            edges_d.join(ranks.select(F.col("id").alias("u"), "rank"), "u")
            .select(F.col("v").alias("id"), (F.col("rank") / F.col("outd")).alias("c"))
            .groupBy("id")
            .agg(F.sum("c").alias("inflow"))
        )
        # dangling mass as a lazy 1-row DataFrame — folded in via
        # crossJoin, so the iteration stays a single job
        dmass = (
            teleport.where("dangling")
            .join(ranks, "id")
            .agg(F.coalesce(F.sum("rank"), F.lit(0.0)).alias("_dmass"))
        )
        new_ranks = (
            teleport.join(contribs, "id", "left")
            .crossJoin(F.broadcast(dmass))
            .select(
                "id",
                (
                    F.lit(1.0 - damping) * F.col("tp")
                    + F.lit(damping)
                    * (
                        F.coalesce("inflow", F.lit(0.0))
                        + F.col("_dmass") * F.col("tp")
                    )
                ).alias("rank"),
            )
            .localCheckpoint(eager=True)
        )
        if (it + 1) % check_every == 0 or it == max_iter - 1:
            delta = (
                new_ranks.join(ranks.select("id", F.col("rank").alias("prev")), "id")
                .agg(F.sum(F.abs(F.col("rank") - F.col("prev"))))
                .collect()[0][0]
            )
            if delta is not None and delta < tol:
                ranks = new_ranks
                break
        ranks = new_ranks
    return ranks


def semantic_similarity_edges(
    nodes: DataFrame,
    id_col: str = "cluster_id",
    vec_col: str = "embedding",
    threshold: float = 0.8,
    max_connections: int = 10,
    method: str = "exact",
    n_planes: int = 8,
    n_tables: int = 4,
    seed: int = 42,
) -> DataFrame:
    """SEMANTICALLY_SIMILAR edges (graph/mod.rs:235-292): per node, the top
    ``max_connections`` neighbors with cosine > ``threshold`` (strict),
    directed per source node exactly as the reference emits them.

    ``method='exact'`` is the correctness baseline (all-pairs — the
    reference's own loop); ``method='lsh'`` is the scale path: sign-bucket
    candidate generation (OR-amplified over ``n_tables`` plane sets), exact
    re-scoring inside buckets only.
    """
    from graphrag_rs_spark.functions import unit_normalize_col

    # Pre-normalize ONCE per row so every pair costs a single dot product
    # (one zip_with/aggregate) instead of dot + two norms — 3× less
    # per-pair work in the O(n²)/bucketed hot loop.
    normed = nodes.select(
        F.col(id_col), unit_normalize_col(F.col(vec_col)).alias(vec_col)
    )
    left = normed.select(F.col(id_col).alias("src"), F.col(vec_col).alias("v1"))
    right = normed.select(F.col(id_col).alias("dst"), F.col(vec_col).alias("v2"))
    if method == "exact":
        # spread the nested-loop join: a small parquet input arrives as ONE
        # partition, which would serialize the whole O(n²) scoring loop on
        # a single task
        n_part = int(nodes.sparkSession.conf.get("spark.sql.shuffle.partitions"))
        pairs = (
            left.repartition(n_part)
            .crossJoin(F.broadcast(right))
            .where(F.col("src") != F.col("dst"))
        )
    elif method == "lsh":
        import random

        first = nodes.select(F.size(vec_col).alias("d")).first()
        dim = int(first["d"]) if first else 0
        rng = random.Random(seed)
        from graphrag_rs_spark.operators.similarity_search import sign_buckets_udf

        planes_tables = [
            [[rng.gauss(0.0, 1.0) for _ in range(dim)] for _ in range(n_planes)]
            for _ in range(n_tables)
        ]
        bucket_of = sign_buckets_udf(planes_tables)
        b = normed.select(
            F.col(id_col),
            F.col(vec_col),
            F.explode(bucket_of(F.col(vec_col))).alias("bucket"),
        )
        lt = b.select("bucket", F.col(id_col).alias("src"), F.col(vec_col).alias("v1"))
        rt = b.select("bucket", F.col(id_col).alias("dst"), F.col(vec_col).alias("v2"))
        pairs = (
            lt.join(rt, "bucket")
            .where(F.col("src") != F.col("dst"))
            .select("src", "dst", "v1", "v2")
            .dropDuplicates(["src", "dst"])
        )
    else:
        raise ValueError(f"unknown method {method!r}")

    # inputs are unit vectors: cosine = plain dot product
    sim = F.aggregate(
        F.zip_with(F.col("v1"), F.col("v2"), lambda a, b: a * b),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    scored = pairs.select("src", "dst", sim.alias("similarity")).where(
        F.col("similarity") > threshold
    )
    w = Window.partitionBy("src").orderBy(F.desc("similarity"), F.asc("dst"))
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= max_connections)
        .select(
            "src",
            F.lit("SEMANTICALLY_SIMILAR").alias("pred"),
            "dst",
            "similarity",
        )
    )


def snapshot_at(
    edges: DataFrame,
    ts,
    valid_from: str = "valid_from",
    valid_to: str = "valid_to",
    point_ts: str = "ts",
) -> DataFrame:
    """Edges active at ``ts`` (graph/temporal.rs:42-49): interval edges when
    both bounds present (inclusive), else point-in-time equality."""
    interval = F.col(valid_from).isNotNull() & F.col(valid_to).isNotNull()
    active = F.when(
        interval,
        (F.col(valid_from) <= F.lit(ts)) & (F.lit(ts) <= F.col(valid_to)),
    ).otherwise(F.col(point_ts) == F.lit(ts))
    return edges.where(active)


def snapshot_range(
    edges: DataFrame,
    start,
    end,
    valid_from: str = "valid_from",
    valid_to: str = "valid_to",
    point_ts: str = "ts",
) -> DataFrame:
    """Edges active in [start, end] (temporal.rs:52-60): interval overlap,
    else point timestamp within range (inclusive)."""
    interval = F.col(valid_from).isNotNull() & F.col(valid_to).isNotNull()
    active = F.when(
        interval,
        (F.col(valid_from) <= F.lit(end)) & (F.col(valid_to) >= F.lit(start)),
    ).otherwise((F.col(point_ts) >= F.lit(start)) & (F.col(point_ts) <= F.lit(end)))
    return edges.where(active)


def keywords_tf(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_keywords: int = 10,
) -> DataFrame:
    """Per-document top-k keywords by term frequency (text/mod.rs:457-481):
    lowercase whitespace words, len > 3, stopword-filtered (the 50-word
    list), count desc. The reference's sort is unstable on ties
    (sort_by on count only); ours tie-breaks lexicographically asc for
    determinism."""
    toks = F.filter(
        F.split(F.lower(F.trim(F.coalesce(F.col(text_col), F.lit("")))), r"\s+"),
        lambda t: (F.length(t) > 3) & ~t.isin(*KEYWORD_STOPWORDS),
    )
    counts = (
        df.select(F.col(id_col), F.explode(toks).alias("word"))
        .groupBy(id_col, "word")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    w = Window.partitionBy(id_col).orderBy(F.desc("cnt"), F.asc("word"))
    return (
        counts.withColumn("krank", F.row_number().over(w))
        .where(F.col("krank") <= max_keywords)
        .select(id_col, "word", "cnt", "krank")
    )


def tfidf_tokens_col(text: Column) -> Column:
    """The TF-IDF tokenizer (text/keyword_extraction.rs:68-85): keep
    alphanumerics plus ``-``/``_`` within each whitespace word, lowercase;
    drop empties, len <= 2, stopwords, pure numbers. Pure JVM expressions.

    The reference keeps UNICODE alphanumerics (``char::is_alphanumeric``),
    so the strip class is ``\\p{L}\\p{N}`` — an ASCII-only class would
    garble accented/non-Latin words."""
    toks = F.split(F.trim(F.coalesce(text, F.lit(""))), r"\s+")
    cleaned = F.transform(
        toks, lambda t: F.lower(F.regexp_replace(t, r"[^\p{L}\p{N}\-_]", ""))
    )
    return F.filter(
        cleaned,
        lambda t: (F.length(t) > 2)
        & ~t.isin(*TFIDF_STOPWORDS)
        & ~t.rlike(r"^[0-9]+$"),
    )


def tfidf_keywords(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    top_k: int = 10,
) -> DataFrame:
    """Per-document top-k TF-IDF keywords
    (text/keyword_extraction.rs:37-120): tf = count/doc_len, corpus idf =
    max(ln(N/df), 0), score = tf·idf; tie-break (score desc, term asc) —
    the reference's partial_cmp sort is tie-unstable.

    Distributed shape: one narrow tokenize pass; term counts and document
    frequencies are two aggregations on the same exploded postings (the
    second reuses the first's shuffle output); N is one driver scalar.
    """
    toks = df.select(
        F.col(id_col), tfidf_tokens_col(F.col(text_col)).alias("toks")
    ).withColumn("dl", F.greatest(F.size("toks"), F.lit(1)))
    n_docs = toks.count()

    counts = (
        toks.select(F.col(id_col), "dl", F.explode("toks").alias("term"))
        .groupBy(id_col, "dl", "term")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    doc_freq = counts.groupBy("term").agg(
        F.count(F.lit(1)).alias("df")
    )
    scored = counts.join(doc_freq, "term").select(
        F.col(id_col),
        "term",
        (
            (F.col("cnt").cast("double") / F.col("dl"))
            * F.greatest(
                F.log(F.lit(float(n_docs)) / F.col("df")), F.lit(0.0)
            )
        ).alias("score"),
    )
    w = Window.partitionBy(id_col).orderBy(F.desc("score"), F.asc("term"))
    return (
        scored.withColumn("krank", F.row_number().over(w))
        .where(F.col("krank") <= top_k)
        .select(id_col, "term", "score", "krank")
    )
