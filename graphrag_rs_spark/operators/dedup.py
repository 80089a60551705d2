"""Deduplication operators for large-scale training-data pipelines.

* :func:`exact_dedup`        — hash-groupBy on normalized content
* :func:`minhash_lsh_dedup`  — shingle → minhash → band → bucket self-join
* :func:`simhash_signatures` — 64-bit SimHash over token hashes
* :func:`ngram_jaccard_pairs`— word n-gram Jaccard over LSH candidates
* :func:`embedding_near_dup` — cosine near-duplicate pairs over embeddings
* :func:`simhash_near_dup`   — banded hamming join (100%-recall pigeonhole)
* :func:`near_dup_clusters`  — pairs → transitive clusters + canonical pick
* :func:`benchmark_contamination` — GPT-3-style n-gram eval-set overlap

Design: signatures are computed with BUILT-IN functions wherever possible
(xxhash64 over shingles via higher-order array functions — JVM-side); only
SimHash's bit-vote accumulation uses a vectorized pandas UDF. Candidate
generation is always banded/blocked — never an all-pairs cross join — so
each stage is a bounded self-join that survives a 100× scale-up.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from graphrag_rs_spark.functions import cosine_similarity_col


def _norm_text(text_col: str):
    return F.regexp_replace(
        F.lower(F.trim(F.coalesce(F.col(text_col), F.lit("")))), r"\s+", " "
    )


def exact_dedup(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """One row per distinct normalized content: keeper id (min), dup count.

    groupBy on a 64-bit content hash — map-side combine absorbs the skew of
    heavily duplicated boilerplate documents.
    """
    hashed = df.select(F.col(id_col), F.xxhash64(_norm_text(text_col)).alias("content_hash"))
    return hashed.groupBy("content_hash").agg(
        F.min(id_col).alias("keep_id"),
        F.count(F.lit(1)).alias("n_copies"),
    )


def _shingle_hashes(text_col: str, shingle: int = 5):
    """array<long> of xxhash64 over word shingles — all JVM-side."""
    toks = F.split(_norm_text(text_col), " ")
    n = F.size(toks)
    idx = F.sequence(F.lit(0), F.greatest(n - shingle, F.lit(0)))
    return F.array_distinct(
        F.transform(idx, lambda i: F.xxhash64(F.array_join(F.slice(toks, i + 1, shingle), " ")))
    )


def minhash_signatures(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_hashes: int = 64,
    shingle: int = 5,
    seed: int = 42,
) -> DataFrame:
    """(id, sig array<long>) — minhash via num_hashes universal-hash
    permutations h_i(x) = (a_i·(x mod p) + b_i) mod p over the Mersenne
    prime p = 2^31 − 1.

    Shingle hashing stays JVM-side (xxhash64 in codegen); the num_hashes×
    |shingles| min-reduction runs as ONE numpy matrix op per row inside an
    Arrow-batched pandas UDF. (The pure-Catalyst alternative — num_hashes
    separate ``F.aggregate`` higher-order folds — is interpreted per
    element and measured ~50× slower at 128 permutations.)"""
    import random

    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    p = (1 << 31) - 1
    rng = random.Random(seed)
    a_np = [rng.randrange(1, p) for _ in range(num_hashes)]
    b_np = [rng.randrange(0, p) for _ in range(num_hashes)]
    shingles = _shingle_hashes(text_col, shingle)

    @pandas_udf("array<long>")
    def minhash_udf(shingle_col: pd.Series) -> pd.Series:
        import numpy as np

        a = np.asarray(a_np, dtype=np.int64)  # (H,)
        b = np.asarray(b_np, dtype=np.int64)
        out = []
        for sh in shingle_col:
            x = np.asarray(sh, dtype=np.int64)
            if x.size == 0:
                out.append([p] * num_hashes)
                continue
            xm = x % p  # non-negative, matches F.pmod
            # (H, N) permutation values; intermediates < 2^62
            vals = (xm[None, :] * a[:, None] + b[:, None]) % p
            out.append([int(v) for v in vals.min(axis=1)])
        return pd.Series(out)

    return df.select(F.col(id_col), minhash_udf(shingles).alias("sig"))


def minhash_lsh_dedup(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_hashes: int = 64,
    bands: int = 16,
    shingle: int = 5,
    jaccard_threshold: float = 0.8,
    seed: int = 42,
) -> DataFrame:
    """Near-duplicate pairs (id1, id2, est_jaccard ≥ threshold).

    banding: signature split into ``bands`` bands of r = num_hashes/bands
    rows; docs sharing any band bucket become candidates; estimated Jaccard
    = fraction of matching minhash positions. The band self-join is the only
    shuffle; bucket sizes are bounded by construction (identical boilerplate
    collapses into one bucket but the pair output is still per-bucket
    quadratic — run exact_dedup FIRST to strip exact copies).
    """
    assert num_hashes % bands == 0
    r = num_hashes // bands
    # eager localCheckpoint: the signature UDF output feeds the banding
    # pass AND both sig re-attach joins. A .cache() here would pin one
    # plan in the CacheManager per call for the session's lifetime
    # (iterative/streaming callers leak); checkpointed RDDs are released
    # by the ContextCleaner once the result goes unreferenced — the same
    # pattern ivf_knn uses
    sigs = minhash_signatures(
        df, text_col, id_col, num_hashes, shingle, seed
    ).localCheckpoint(eager=True)

    banded = sigs.select(
        F.col(id_col),
        "sig",
        F.explode(
            F.transform(
                F.sequence(F.lit(0), F.lit(bands - 1)),
                lambda b: F.struct(
                    b.alias("band"),
                    F.xxhash64(
                        F.array_join(
                            F.transform(
                                F.slice("sig", b * r + 1, r), lambda x: x.cast("string")
                            ),
                            ",",
                        )
                    ).alias("bucket"),
                ),
            )
        ).alias("bb"),
    ).select(F.col(id_col), "sig", F.col("bb.band").alias("band"), F.col("bb.bucket").alias("bucket"))

    # join on ids only — carrying the 128-long sig through a ×bands
    # exploded self-join would multiply shuffle volume by bands; signatures
    # re-attach to the (much smaller) deduped candidate set afterwards
    left = banded.select("band", "bucket", F.col(id_col).alias("id1"))
    right = banded.select("band", "bucket", F.col(id_col).alias("id2"))
    pair_ids = (
        left.join(right, ["band", "bucket"])
        .where(F.col("id1") < F.col("id2"))
        .select("id1", "id2")
        .dropDuplicates(["id1", "id2"])
    )
    sig_only = sigs.select(F.col(id_col), "sig")
    cand = (
        pair_ids.join(
            sig_only.select(F.col(id_col).alias("id1"), F.col("sig").alias("sig1")),
            "id1",
        )
        .join(
            sig_only.select(F.col(id_col).alias("id2"), F.col("sig").alias("sig2")),
            "id2",
        )
    )
    # estimated jaccard = matching minhash positions / num_hashes
    cand = cand.withColumn(
        "est_jaccard",
        F.size(F.filter(F.zip_with("sig1", "sig2", lambda a, b: a == b), lambda x: x))
        .cast("double")
        / F.lit(float(num_hashes)),
    )
    return cand.where(F.col("est_jaccard") >= jaccard_threshold).select(
        "id1", "id2", "est_jaccard"
    )


def simhash_signatures(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id",
    hash_fn: str = "xxhash64",
) -> DataFrame:
    """SimHash per document (bit-vote over token hash values).

    ``hash_fn='xxhash64'`` (default, 64-bit) is the performance path —
    token hashing stays in JVM codegen. ``hash_fn='md5'`` derives a 60-bit
    token hash from the first 15 hex digits of md5 — slightly slower, but
    reproducible outside the JVM (hashlib), which is what the driver's
    DuckDB-side oracle twin checks against.

    The vote accumulation is a vectorized pandas UDF over Arrow batches
    (numpy bit unpacking — no per-row Python loops over bits).
    """
    if hash_fn == "xxhash64":
        token_hash = lambda t: F.xxhash64(t)  # noqa: E731
        n_bits = 64
    elif hash_fn == "md5":
        token_hash = lambda t: F.conv(  # noqa: E731
            F.substring(F.md5(t), 1, 15), 16, 10
        ).cast("long")
        n_bits = 60
    else:
        raise ValueError(f"unknown hash_fn {hash_fn!r}")

    toks = df.select(
        F.col(id_col),
        F.transform(F.split(_norm_text(text_col), " "), token_hash).alias("th"),
    )

    def simhash_batches(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import numpy as np
        import pandas as pd

        for pdf in batches:
            out = []
            for doc_id, hashes in zip(pdf[pdf.columns[0]], pdf["th"]):
                arr = np.asarray(hashes, dtype=np.uint64)
                if arr.size == 0:
                    out.append((doc_id, 0))
                    continue
                bits = ((arr[:, None] >> np.arange(n_bits, dtype=np.uint64)) & 1).sum(axis=0)
                votes = bits * 2 > arr.size
                val = 0
                for i in np.nonzero(votes)[0]:
                    val |= 1 << int(i)
                # fold to signed int64 for Spark LongType
                if val >= 2**63:
                    val -= 2**64
                out.append((doc_id, val))
            yield pd.DataFrame(out, columns=[pdf.columns[0], "simhash"])

    # id column keeps the INPUT's type (string doc ids work like they do
    # in every sibling dedup operator; a hardcoded long schema made Arrow
    # conversion throw on them)
    id_type = dict(df.dtypes)[id_col]
    return toks.mapInPandas(
        simhash_batches, schema=f"{id_col} {id_type}, simhash long"
    )


def ngram_jaccard_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
    threshold: float = 0.7,
    num_hashes: int = 64,
    bands: int = 16,
    seed: int = 42,
) -> DataFrame:
    """Exact word n-gram Jaccard over MinHash-LSH candidates: LSH prunes the
    pair space, then the true Jaccard is computed JVM-side on the shingle
    hash sets (array_intersect / array_union)."""
    cands = minhash_lsh_dedup(
        df, text_col, id_col, num_hashes=num_hashes, bands=bands,
        shingle=n, jaccard_threshold=0.0, seed=seed,
    )
    grams = df.select(F.col(id_col), _shingle_hashes(text_col, n).alias("grams"))
    joined = (
        cands.join(grams.select(F.col(id_col).alias("id1"), F.col("grams").alias("g1")), "id1")
        .join(grams.select(F.col(id_col).alias("id2"), F.col("grams").alias("g2")), "id2")
    )
    jacc = F.size(F.array_intersect("g1", "g2")).cast("double") / F.greatest(
        F.size(F.array_union("g1", "g2")), F.lit(1)
    ).cast("double")
    return joined.select("id1", "id2", jacc.alias("jaccard")).where(
        F.col("jaccard") >= threshold
    )


def embedding_near_dup(
    df: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    threshold: float = 0.95,
    n_planes: int = 12,
    seed: int = 42,
) -> DataFrame:
    """Cosine near-duplicate pairs via random-hyperplane LSH buckets.

    Sign-pattern bucket (n_planes random hyperplanes) → per-bucket
    self-join → exact JVM-side cosine filter. Near-identical vectors agree
    on every plane, so recall at threshold ≥ 0.95 is high; raise bands by
    calling with several seeds and unioning if more recall is needed.
    """
    import random

    from graphrag_rs_spark.operators.similarity_search import sign_buckets_udf

    first = df.select(F.size(vec_col).alias("d")).first()
    dim = int(first["d"]) if first else 0
    rng = random.Random(seed)
    planes = [[rng.gauss(0.0, 1.0) for _ in range(dim)] for _ in range(n_planes)]

    # single-table sign bucketing, one numpy pass per Arrow batch
    bucket_of = sign_buckets_udf([planes])
    buckets = df.select(
        F.col(id_col),
        F.col(vec_col),
        F.explode(bucket_of(F.col(vec_col))).alias("bucket"),
    )
    left = buckets.select(
        "bucket", F.col(id_col).alias("id1"), F.col(vec_col).alias("v1")
    )
    right = buckets.select(
        "bucket", F.col(id_col).alias("id2"), F.col(vec_col).alias("v2")
    )
    pairs = left.join(right, "bucket").where(F.col("id1") < F.col("id2"))
    cos = cosine_similarity_col(F.col("v1"), F.col("v2"))
    return pairs.select("id1", "id2", cos.alias("cosine")).where(
        F.col("cosine") >= threshold
    )


def near_dup_clusters(
    pairs: DataFrame,
    docs: DataFrame | None = None,
    id_col: str = "doc_id",
    text_col: str = "text",
    keep: str = "min_id",
) -> DataFrame:
    """Turn near-duplicate PAIRS into clusters with one canonical survivor
    — the materialization a training-data dedup pipeline actually filters
    on (``WHERE is_canonical``).

    ``pairs(id1, id2)`` is the output of any sibling pair generator
    (:func:`minhash_lsh_dedup`, :func:`ngram_jaccard_pairs`,
    :func:`embedding_near_dup`, a SimHash distance join). Clusters are the
    connected components of the pair graph (transitive closure — A≈B and
    B≈C dedupe together even when A,C were never paired), computed by the
    size-gated :func:`~graphrag_rs_spark.operators.graph.
    connected_components` (local / two-level / large-star–small-star), so
    the composition inherits its scale path.

    Returns ``(doc_id, cluster_id, is_canonical)``:

    * ``cluster_id`` — the minimum string member id (the CC representative).
    * ``keep="min_id"`` — the smallest *present* member id is canonical
      (pure JVM, no extra shuffle beyond CC). With ``docs`` provided the
      minimum is taken over the cluster members that exist in ``docs`` —
      pair ids absent from ``docs`` may still name the cluster (CC
      representative) but can never be the survivor, so every non-empty
      cluster keeps exactly one canonical row even when the
      representative itself was filtered out of ``docs`` upstream.
    * ``keep="longest"`` — the longest ``text_col`` in the cluster wins,
      ties to the smaller id (requires ``docs``); one window over
      cluster_id — partition sizes are bounded by cluster membership, not
      corpus size.
    * with ``docs`` provided, documents in no pair come out as their own
      singleton cluster (canonical); without ``docs``, only paired ids
      appear and ids are returned as strings (CC's id domain).
    """
    from pyspark.sql import Window

    from graphrag_rs_spark.operators.graph import connected_components

    if keep not in ("min_id", "longest"):
        raise ValueError(f"unknown keep policy {keep!r}: 'min_id' | 'longest'")
    if keep == "longest" and docs is None:
        raise ValueError("keep='longest' requires the docs DataFrame")

    edges = pairs.select(
        F.col("id1").cast("string").alias("src"),
        F.col("id2").cast("string").alias("dst"),
    )
    # rename CC output before any join: its 'id' column would otherwise
    # collide with id_col='id' inputs (AMBIGUOUS_REFERENCE)
    cc = connected_components(edges).select(
        F.col("id").alias("_cc_id"), F.col("component").alias("_cc_comp")
    )

    if docs is None:
        out = cc.select(
            F.col("_cc_id").alias(id_col),
            F.col("_cc_comp").alias("cluster_id"),
            (F.col("_cc_id") == F.col("_cc_comp")).alias("is_canonical"),
        )
        return out

    base = docs.select(
        F.col(id_col),
        F.col(id_col).cast("string").alias("_sid"),
        *([F.length(F.coalesce(F.col(text_col), F.lit(""))).alias("_len")]
          if keep == "longest" else []),
    )
    assigned = (
        base.join(cc, base["_sid"] == cc["_cc_id"], "left")
        .select(
            F.col(id_col),
            "_sid",
            *(["_len"] if keep == "longest" else []),
            F.coalesce(F.col("_cc_comp"), F.col("_sid")).alias("cluster_id"),
        )
    )
    if keep == "min_id":
        # canonical = minimum _sid among the cluster members PRESENT in
        # docs (not `_sid == cluster_id`): pair ids missing from docs are
        # dropped by the left join above, and if the dropped id was the
        # CC representative no member would match it — the window keeps
        # the exactly-one-canonical-per-cluster invariant regardless
        w_min = Window.partitionBy("cluster_id")
        return assigned.select(
            id_col,
            "cluster_id",
            (F.col("_sid") == F.min("_sid").over(w_min)).alias(
                "is_canonical"
            ),
        )
    w = Window.partitionBy("cluster_id").orderBy(
        F.desc("_len"), F.asc("_sid")
    )
    return assigned.select(
        id_col,
        "cluster_id",
        (F.row_number().over(w) == 1).alias("is_canonical"),
    )


def simhash_near_dup(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_hamming: int = 3,
    hash_fn: str = "xxhash64",
    signatures: DataFrame | None = None,
) -> DataFrame:
    """SimHash near-duplicate pairs ``(id1, id2, hamming ≤ max_hamming)``
    by banded hamming join — the distributed pair finder the signature
    operator feeds (completing exact→banded parity with the MinHash path).

    The signature's ``n_bits`` are partitioned into ``max_hamming + 1``
    contiguous bands; by pigeonhole, two signatures within hamming
    distance ``max_hamming`` differ in at most ``max_hamming`` bands and
    therefore agree EXACTLY on at least one — so a self-join on
    (band_idx, band_value) has **100% recall** (no probabilistic miss, in
    contrast to MinHash banding), and the exact ``bit_count(s1 XOR s2)``
    filter removes band-collision false positives. Everything is JVM
    codegen: shift/mask band extraction, one exploded self-join (the only
    shuffle), popcount filter, pair dedupe.

    Scale note (same caveat as :func:`minhash_lsh_dedup`): identical
    boilerplate collapses into one band bucket whose pair output is
    quadratic — run :func:`exact_dedup` first to strip exact copies;
    empty documents all hash to simhash 0 and should be filtered upstream.

    ``signatures`` lets callers reuse a precomputed
    :func:`simhash_signatures` output (columns ``(id_col, simhash)``).
    """
    n_bits = 64 if hash_fn == "xxhash64" else 60
    if not 0 <= max_hamming < n_bits:
        raise ValueError(f"max_hamming must be in [0, {n_bits}): {max_hamming}")
    sigs = (
        signatures
        if signatures is not None
        else simhash_signatures(df, text_col, id_col, hash_fn)
    )
    bands = max_hamming + 1
    base, rem = divmod(n_bits, bands)
    pieces, off = [], 0
    for i in range(bands):
        w = base + (1 if i < rem else 0)
        shifted = F.shiftrightunsigned(F.col("simhash"), off)
        if w < 64:  # a full-width band needs no mask (2^64-1 overflows lit)
            shifted = shifted.bitwiseAND(F.lit((1 << w) - 1))
        pieces.append(F.struct(F.lit(i).alias("b"), shifted.alias("v")))
        off += w
    banded = sigs.select(
        F.col(id_col), "simhash", F.explode(F.array(*pieces)).alias("bv")
    )
    # the signature is one long — cheaper to carry both sides through the
    # band join than to re-attach via two extra joins (cf. minhash, whose
    # 64-128-element sig arrays force the ids-only pattern)
    left = banded.select(
        "bv", F.col(id_col).alias("id1"), F.col("simhash").alias("s1")
    )
    right = banded.select(
        "bv", F.col(id_col).alias("id2"), F.col("simhash").alias("s2")
    )
    return (
        left.join(right, "bv")
        .where(F.col("id1") < F.col("id2"))
        .select(
            "id1",
            "id2",
            F.bit_count(F.col("s1").bitwiseXOR(F.col("s2"))).alias("hamming"),
        )
        .where(F.col("hamming") <= max_hamming)
        .dropDuplicates(["id1", "id2"])
    )


def benchmark_contamination(
    docs: DataFrame,
    benchmark: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    bench_text_col: str = "text",
    n: int = 13,
    min_hits: int = 1,
    broadcast_benchmark: bool = True,
) -> DataFrame:
    """Flag training documents that overlap an evaluation benchmark — the
    GPT-3-style n-gram decontamination check (Brown et al. 2020 §C used
    13-grams; the default here) every training-data pipeline runs before
    a model ships.

    Both sides reduce to DISTINCT word n-gram hashes (the same JVM
    ``xxhash64``-over-shingles machinery as :func:`minhash_signatures`).
    Returns one row per input document::

        (doc_id, n_grams, contaminated_grams, contamination_frac,
         is_contaminated)

    * ``n_grams`` — the document's distinct n-gram count (0 when shorter
      than ``n`` tokens → never flagged).
    * ``contaminated_grams`` — how many of those occur anywhere in the
      benchmark; ``contamination_frac`` = the ratio;
      ``is_contaminated`` = ``contaminated_grams >= min_hits``.

    Scale shape: the benchmark gram set is eval-suite-sized (thousands of
    rows, not corpus-sized), so with ``broadcast_benchmark`` (default)
    the collision join is a map-side BroadcastHashJoin against the
    exploded corpus grams and the only wide stage is the per-doc count
    re-aggregation keyed on doc_id. Set it False for a giant benchmark
    side and the join degrades gracefully to shuffle."""
    # _shingle_hashes emits one truncated gram for texts under n tokens;
    # filter both sides to real n-gram coverage so a 2-word doc can never
    # collide with a 2-word benchmark row
    doc_grams = docs.where(
        F.size(F.split(_norm_text(text_col), " ")) >= n
    ).select(F.col(id_col), F.explode(_shingle_hashes(text_col, n)).alias("g"))
    bench_grams = (
        benchmark.where(F.size(F.split(_norm_text(bench_text_col), " ")) >= n)
        .select(F.explode(_shingle_hashes(bench_text_col, n)).alias("g"))
        .distinct()
    )
    if broadcast_benchmark:
        bench_grams = F.broadcast(bench_grams)
    totals = docs.select(
        F.col(id_col),
        # count real n-gram coverage as 0 under n tokens (matching the
        # gram-side filter above)
        F.when(
            F.size(F.split(_norm_text(text_col), " ")) >= n,
            F.size(_shingle_hashes(text_col, n)),
        ).otherwise(F.lit(0)).alias("n_grams"),
    )
    hits = (
        doc_grams.join(bench_grams, "g", "left_semi")
        .groupBy(id_col)
        .agg(F.count(F.lit(1)).alias("contaminated_grams"))
    )
    return (
        totals.join(hits, id_col, "left")
        .select(
            id_col,
            "n_grams",
            F.coalesce("contaminated_grams", F.lit(0)).alias(
                "contaminated_grams"
            ),
            F.when(
                F.col("n_grams") > 0,
                F.coalesce("contaminated_grams", F.lit(0)).cast("double")
                / F.col("n_grams").cast("double"),
            ).otherwise(F.lit(0.0)).alias("contamination_frac"),
            (
                (F.col("n_grams") > 0)
                & (F.coalesce("contaminated_grams", F.lit(0)) >= min_hits)
            ).alias("is_contaminated"),
        )
    )
