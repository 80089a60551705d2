"""Training-data pipeline operators: dedup, similarity search, text
analysis, multimodal plumbing — correctness on small hand-checkable inputs."""

import math

import numpy as np
import pytest
from pyspark.sql import functions as F

from graphrag_rs_spark.operators.dedup import (
    embedding_near_dup,
    exact_dedup,
    minhash_lsh_dedup,
    near_dup_clusters,
    simhash_near_dup,
    ngram_jaccard_pairs,
    simhash_signatures,
)
from graphrag_rs_spark.operators.multimodal import (
    extract_features,
    frame_sample,
    media_table,
)
from graphrag_rs_spark.operators.similarity_search import (
    brute_force_knn,
    ivf_knn,
    lsh_knn,
)
from graphrag_rs_spark.operators.text_analysis import (
    fingerprints,
    language_id,
    quality_scores,
    token_counts,
)
from graphrag_rs_spark.streaming.incremental import (
    change_log,
    merge_edges,
    merge_nodes,
)

DOCS = [
    (1, "the quick brown fox jumps over the lazy dog again and again today"),
    (2, "The  quick brown fox jumps over the lazy dog again and again today"),  # ws/case dup of 1
    (3, "the quick brown fox jumps over the lazy cat again and again today"),  # near-dup of 1
    (4, "completely different content about spark dataframes and shuffles here"),
    (5, "der hund und die katze sind nicht mit der maus in das haus"),
]


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(DOCS, "doc_id long, text string").cache()


# ---------------------------------------------------------------------------
# dedup
# ---------------------------------------------------------------------------

def test_exact_dedup_collapses_normalized_copies(docs):
    rows = exact_dedup(docs, "text", "doc_id").collect()
    by_keeper = {r["keep_id"]: r["n_copies"] for r in rows}
    assert by_keeper[1] == 2          # doc 2 is a whitespace/case copy of 1
    assert by_keeper[3] == 1
    assert sum(by_keeper.values()) == len(DOCS)


def test_minhash_lsh_finds_exact_pair(docs):
    pairs = minhash_lsh_dedup(
        docs, "text", "doc_id", num_hashes=64, bands=16, jaccard_threshold=0.9
    ).collect()
    found = {(r["id1"], r["id2"]): r["est_jaccard"] for r in pairs}
    assert found.get((1, 2)) == 1.0   # identical shingle sets → all minhashes equal
    assert (1, 4) not in found and (2, 4) not in found


def test_ngram_jaccard_exact_values(docs):
    pairs = ngram_jaccard_pairs(
        docs, "text", "doc_id", n=3, threshold=0.3, num_hashes=128, bands=64
    ).collect()
    got = {(r["id1"], r["id2"]): r["jaccard"] for r in pairs}
    assert got[(1, 2)] == 1.0

    # hand-computed 3-gram jaccard between docs 1 and 3 (one word differs)
    def grams(text, n=3):
        toks = " ".join(text.lower().split()).split(" ")
        return {
            " ".join(toks[i:i + n]) for i in range(max(len(toks) - n, 0) + 1)
        }
    g1, g3 = grams(DOCS[0][1]), grams(DOCS[2][1])
    expected = len(g1 & g3) / len(g1 | g3)
    assert got[(1, 3)] == pytest.approx(expected, abs=1e-12)


def test_simhash_identical_for_normalized_copies(docs):
    sigs = {r["doc_id"]: r["simhash"] for r in simhash_signatures(docs, "text", "doc_id").collect()}
    assert sigs[1] == sigs[2]
    assert sigs[1] != sigs[4]
    # near-dup docs differ in few bits
    hamming = bin((sigs[1] ^ sigs[3]) & (2**64 - 1)).count("1")
    assert hamming <= 16


def test_embedding_near_dup_identical_vectors(spark):
    rows = [(1, [1.0, 0.0, 2.0, 0.5]), (2, [1.0, 0.0, 2.0, 0.5]),
            (3, [-1.0, 2.0, 0.0, 0.0]), (4, [0.9999, 0.001, 2.0001, 0.5])]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    pairs = {(r["id1"], r["id2"]): r["cosine"]
             for r in embedding_near_dup(df, threshold=0.95).collect()}
    assert pairs[(1, 2)] == pytest.approx(1.0, abs=1e-6)
    assert (1, 4) in pairs
    assert all(3 not in p for p in pairs)


# ---------------------------------------------------------------------------
# similarity search
# ---------------------------------------------------------------------------

@pytest.fixture(scope="module")
def vectors(spark):
    rng = np.random.default_rng(7)
    rows = [(i, [float(x) for x in rng.normal(size=16)]) for i in range(80)]
    return (
        spark.createDataFrame(rows, "vec_id long, embedding array<float>").cache(),
        rows,
    )


def _numpy_topk(rows, qids, k=5):
    mat = np.array([r[1] for r in rows])
    ids = np.array([r[0] for r in rows])
    out = {}
    for q in qids:
        qv = mat[list(ids).index(q)]
        cos = mat @ qv / (np.linalg.norm(mat, axis=1) * np.linalg.norm(qv))
        order = sorted(zip(-cos, ids))[:k]
        out[q] = [int(i) for _, i in order]
    return out


def test_brute_force_knn_matches_numpy(vectors):
    df, rows = vectors
    qs = df.where(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    got = brute_force_knn(df, qs, k=5).collect()
    by_q = {}
    for r in sorted(got, key=lambda r: (r["query_id"], r["rank"])):
        by_q.setdefault(r["query_id"], []).append(r["vec_id"])
    assert by_q == _numpy_topk(rows, [0, 1, 2], k=5)


def test_lsh_knn_self_hit_and_subset(vectors):
    df, rows = vectors
    qs = df.where(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    got = lsh_knn(df, qs, k=5, n_planes=6, n_tables=6).collect()
    by_q = {}
    for r in sorted(got, key=lambda r: (r["query_id"], r["rank"])):
        by_q.setdefault(r["query_id"], []).append(r["vec_id"])
    for q, hits in by_q.items():
        assert hits[0] == q  # a vector's nearest neighbor is itself


def test_ivf_knn_self_hit(vectors):
    df, rows = vectors
    qs = df.where(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    got = ivf_knn(df, qs, k=5, n_centroids=8, n_probe=4).collect()
    by_q = {}
    for r in sorted(got, key=lambda r: (r["query_id"], r["rank"])):
        by_q.setdefault(r["query_id"], []).append(r["vec_id"])
    for q, hits in by_q.items():
        assert hits[0] == q


def test_ivf_knn_string_ids_deterministic(spark, vectors):
    # the centroid init hashes the id and seed as separate xxhash64 args:
    # the old arithmetic `id + seed` cast string ids to NULL, hashing
    # every row to one constant (arbitrary, partition-order centroids)
    df, rows = vectors
    sdf = df.select(
        F.concat(F.lit("doc_"), F.col("vec_id")).alias("vec_id"), "embedding"
    )
    qs = sdf.where(F.col("vec_id").isin("doc_0", "doc_1")).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    got1 = sorted(
        (r["query_id"], r["rank"], r["vec_id"])
        for r in ivf_knn(sdf, qs, k=5, n_centroids=8, n_probe=4).collect()
    )
    got2 = sorted(
        (r["query_id"], r["rank"], r["vec_id"])
        for r in ivf_knn(sdf, qs, k=5, n_centroids=8, n_probe=4).collect()
    )
    assert got1 == got2  # same seed -> same centroids -> same result
    by_q = {}
    for q, _, hit in got1:
        by_q.setdefault(q, []).append(hit)
    for q, hits in by_q.items():
        assert hits[0] == q


def test_simhash_accepts_string_doc_ids(spark):
    # the signature schema derives the id type from the input (was
    # hardcoded long, which threw on the string ids every sibling dedup
    # operator accepts)
    from graphrag_rs_spark.operators.dedup import simhash_signatures

    df = spark.createDataFrame(
        [("doc_a", "alpha beta gamma"), ("doc_b", "alpha beta gamma")],
        "doc_id string, text string",
    )
    got = {r["doc_id"]: r["simhash"] for r in simhash_signatures(df).collect()}
    assert set(got) == {"doc_a", "doc_b"}
    assert got["doc_a"] == got["doc_b"]  # identical text, identical hash


# ---------------------------------------------------------------------------
# text analysis
# ---------------------------------------------------------------------------

def test_token_counts_hand_checked(spark):
    df = spark.createDataFrame(
        [(1, "Hello, world! 42"), (2, ""), (3, "   ")], "doc_id long, text string"
    )
    got = {r["doc_id"]: (r["n_chars"], r["n_tokens"], r["n_pieces"])
           for r in token_counts(df).collect()}
    # pieces: Hello , world ! 42 → 5
    assert got[1] == (16, 3, 5)
    assert got[2] == (0, 0, 0)
    assert got[3] == (3, 0, 0)


def test_quality_scores_bounds_and_stopwords(spark):
    df = spark.createDataFrame(
        [(1, "the cat and the dog sat on the mat with a hat for fun today"),
         (2, "x!!!! y???? z;;;;")],
        "doc_id long, text string",
    )
    got = {r["doc_id"]: r for r in quality_scores(df).collect()}
    assert got[1]["quality_score"] == 1.0
    assert got[2]["quality_score"] <= 0.5
    assert got[1]["stopword_ratio"] > 0.4
    assert 0 <= got[2]["punct_ratio"] <= 1


def test_language_id_separates_en_de(docs):
    got = {r["doc_id"]: r["lang_pred"] for r in language_id(docs, "text", "doc_id").collect()}
    assert got[1] == "en"
    assert got[5] == "de"


def test_fingerprints_normalization_invariance(docs):
    got = {r["doc_id"]: r for r in fingerprints(docs, "text", "doc_id").collect()}
    assert got[1]["content_hash"] == got[2]["content_hash"]
    assert got[1]["content_md5"] == got[2]["content_md5"]
    assert got[1]["shingle_sig"] == got[2]["shingle_sig"]
    assert got[1]["content_hash"] != got[4]["content_hash"]


# ---------------------------------------------------------------------------
# multimodal plumbing
# ---------------------------------------------------------------------------

def test_multimodal_features_deterministic(spark):
    rows = [(i, bytes(range(10)) * (i + 1)) for i in range(6)]
    df = spark.createDataFrame(rows, "media_id long, payload binary")
    media = media_table(df, "payload", "image", "media_id")
    feats = extract_features(media, n_features=8).collect()
    assert len(feats) == 6
    for r in feats:
        assert len(r["features"]) == 8
        assert abs(sum(r["features"]) - 1.0) < 1e-5  # histogram normalized
    again = extract_features(media, n_features=8).collect()
    assert sorted(map(tuple, feats)) == sorted(map(tuple, again))


def test_multimodal_real_decode_rejects_unknown_formats(spark):
    # the PIL/ffmpeg plug point: formats outside the stdlib kernels
    # (PNG/WAV — see tests/test_media_decode.py for the real paths) raise
    df = spark.createDataFrame([(1, b"abc")], "media_id long, payload binary")
    media = media_table(df, "payload", "image", "media_id")
    with pytest.raises(Exception, match="ValueError|PNG/WAV"):
        extract_features(media, decode="real").collect()


def test_frame_sample_counts(spark):
    payload = bytes(5000)
    df = spark.createDataFrame([(1, payload)], "media_id long, payload binary")
    media = media_table(df, "payload", "video", "media_id")
    frames = frame_sample(media, every_n_bytes=1024, frame_bytes=64).collect()
    assert len(frames) == math.ceil(5000 / 1024)
    assert all(len(f["frame"]) <= 64 for f in frames)
    assert [f["offset"] for f in sorted(frames, key=lambda f: f["frame_idx"])] == [
        0, 1024, 2048, 3072, 4096
    ]


# ---------------------------------------------------------------------------
# incremental merge (streaming stand-in)
# ---------------------------------------------------------------------------

def _nodes_df(spark, rows):
    return spark.createDataFrame(
        rows,
        "cluster_id string, name string, entity_type string, confidence double,"
        " mention_count long, member_count long, aliases array<string>",
    )


def test_merge_nodes_highest_confidence(spark):
    old = _nodes_df(spark, [("c1", "Old Name", "PERSON", 0.9, 5, 1, ["Old Name"])])
    new = _nodes_df(spark, [("c1", "New Name", "PERSON", 0.7, 2, 1, ["New Name"]),
                            ("c2", "Fresh", "ORGANIZATION", 0.8, 1, 1, ["Fresh"])])
    got = {r["cluster_id"]: r for r in merge_nodes(old, new, "highest_confidence").collect()}
    assert got["c1"]["name"] == "Old Name"       # higher confidence wins
    assert got["c2"]["name"] == "Fresh"


def test_merge_nodes_latest_wins_and_merge(spark):
    old = _nodes_df(spark, [("c1", "Old", "PERSON", 0.9, 5, 1, ["Old"])])
    new = _nodes_df(spark, [("c1", "New", "PERSON", 0.7, 2, 1, ["New"])])
    latest = {r["cluster_id"]: r for r in merge_nodes(old, new, "latest_wins").collect()}
    assert latest["c1"]["name"] == "New"
    merged = {r["cluster_id"]: r for r in merge_nodes(old, new, "merge").collect()}
    assert merged["c1"]["confidence"] == 0.9
    assert merged["c1"]["mention_count"] == 7
    assert merged["c1"]["aliases"] == ["New", "Old"]


def test_merge_edges_unions_contexts(spark):
    schema = "subj string, pred string, obj string, confidence double, context array<string>"
    old = spark.createDataFrame([("a", "KNOWS", "b", 0.5, ["c1"])], schema)
    new = spark.createDataFrame([("a", "KNOWS", "b", 0.8, ["c2"]),
                                 ("a", "KNOWS", "c", 0.5, ["c3"])], schema)
    got = {(r["subj"], r["pred"], r["obj"]): r for r in merge_edges(old, new).collect()}
    assert got[("a", "KNOWS", "b")]["confidence"] == 0.8
    assert got[("a", "KNOWS", "b")]["context"] == ["c1", "c2"]


def test_change_log(spark):
    old = spark.createDataFrame([("a",), ("b",)], "id string")
    new = spark.createDataFrame([("b",), ("c",)], "id string")
    got = {(r["op"], r["id"]) for r in change_log(old, new, ["id"]).collect()}
    assert got == {("added", "c"), ("removed", "a")}


def test_near_dup_clusters_transitive_min_id(spark):
    """A~B and B~C cluster together even though A,C were never paired;
    representative (min id) is canonical; singleton doc D survives as its
    own canonical cluster."""
    pairs = spark.createDataFrame(
        [("a", "b"), ("b", "c"), ("x", "y")], "id1 string, id2 string"
    )
    docs = spark.createDataFrame(
        [("a", "t"), ("b", "t"), ("c", "t"), ("x", "t"), ("y", "t"), ("d", "t")],
        "doc_id string, text string",
    )
    rows = {r["doc_id"]: r for r in near_dup_clusters(pairs, docs).collect()}
    assert rows["a"]["cluster_id"] == rows["b"]["cluster_id"] == rows["c"]["cluster_id"] == "a"
    assert rows["x"]["cluster_id"] == rows["y"]["cluster_id"] == "x"
    assert rows["d"]["cluster_id"] == "d" and rows["d"]["is_canonical"]
    canon = {k for k, r in rows.items() if r["is_canonical"]}
    assert canon == {"a", "x", "d"}


def test_near_dup_clusters_keep_longest(spark):
    pairs = spark.createDataFrame([("a", "b")], "id1 string, id2 string")
    docs = spark.createDataFrame(
        [("a", "short"), ("b", "much longer text wins")],
        "doc_id string, text string",
    )
    rows = {
        r["doc_id"]: r["is_canonical"]
        for r in near_dup_clusters(pairs, docs, keep="longest").collect()
    }
    assert rows == {"a": False, "b": True}
    with pytest.raises(ValueError, match="longest"):
        near_dup_clusters(pairs, keep="longest")
    with pytest.raises(ValueError, match="keep"):
        near_dup_clusters(pairs, docs, keep="bogus")


def test_near_dup_clusters_int_ids_and_pairs_only(spark):
    """Integer doc ids round-trip (output keeps the input type when docs
    are provided); pairs-only mode returns the CC string domain."""
    pairs = spark.createDataFrame([(2, 10)], "id1 long, id2 long")
    docs = spark.createDataFrame(
        [(2, "t"), (10, "t"), (7, "t")], "doc_id long, text string"
    )
    out = near_dup_clusters(pairs, docs)
    assert dict(out.dtypes)["doc_id"] == "bigint"
    rows = {r["doc_id"]: r for r in out.collect()}
    # string-domain representative: min STRING id of {"2","10"} is "10"
    assert rows[2]["cluster_id"] == rows[10]["cluster_id"] == "10"
    assert rows[10]["is_canonical"] and not rows[2]["is_canonical"]
    assert rows[7]["cluster_id"] == "7" and rows[7]["is_canonical"]
    only_pairs = {r["doc_id"] for r in near_dup_clusters(pairs).collect()}
    assert only_pairs == {"2", "10"}


def test_near_dup_clusters_id_col_named_id(spark):
    """Regression (ADVICE r3): id_col='id' used to collide with the CC
    output's own 'id' column and raise AMBIGUOUS_REFERENCE."""
    pairs = spark.createDataFrame([("a", "b")], "id1 string, id2 string")
    docs = spark.createDataFrame(
        [("a", "t"), ("b", "t"), ("z", "t")], "id string, text string"
    )
    rows = {
        r["id"]: r for r in near_dup_clusters(pairs, docs, id_col="id").collect()
    }
    assert rows["a"]["is_canonical"] and not rows["b"]["is_canonical"]
    assert rows["z"]["cluster_id"] == "z" and rows["z"]["is_canonical"]
    # keep='longest' exercises the same join path
    out = near_dup_clusters(pairs, docs, id_col="id", keep="longest")
    assert out.count() == 3


def test_near_dup_clusters_representative_missing_from_docs(spark):
    """Regression (ADVICE r3): when the cluster's min-id member is absent
    from docs (e.g. filtered upstream), the exactly-one-canonical
    invariant must still hold — the smallest PRESENT member wins."""
    pairs = spark.createDataFrame(
        [("a", "b"), ("a", "c")], "id1 string, id2 string"
    )
    docs = spark.createDataFrame(  # 'a' (the CC representative) missing
        [("b", "t"), ("c", "t")], "doc_id string, text string"
    )
    rows = {r["doc_id"]: r for r in near_dup_clusters(pairs, docs).collect()}
    assert set(rows) == {"b", "c"}
    assert rows["b"]["cluster_id"] == rows["c"]["cluster_id"] == "a"
    canon = [k for k, r in rows.items() if r["is_canonical"]]
    assert canon == ["b"]  # smallest present member, exactly one


def test_near_dup_clusters_composes_with_lsh(docs):
    """End-to-end: MinHash-LSH pairs from the shared fixture feed the
    cluster materialization; every pair's two sides land in one cluster
    with exactly one canonical member."""
    pairs = minhash_lsh_dedup(docs, jaccard_threshold=0.8)
    clustered = near_dup_clusters(pairs, docs)
    got_pairs = pairs.collect()
    assert got_pairs, "fixture should produce at least one near-dup pair"
    cl = {r["doc_id"]: r["cluster_id"] for r in clustered.collect()}
    for p in got_pairs:
        assert cl[p["id1"]] == cl[p["id2"]]
    canon_per_cluster = (
        clustered.groupBy("cluster_id")
        .agg(F.sum(F.col("is_canonical").cast("int")).alias("n"))
        .collect()
    )
    assert all(r["n"] == 1 for r in canon_per_cluster)


def test_simhash_near_dup_exhaustive_vs_bruteforce(spark):
    """Banded hamming join vs a brute-force popcount filter over random
    signatures: the pigeonhole construction guarantees 100% recall, the
    exact XOR filter guarantees 100% precision — the outputs must be
    IDENTICAL, including the hamming values."""
    import random

    rng = random.Random(123)
    sigs = []
    base = rng.getrandbits(63)
    for i in range(30):
        v = base if i < 10 else rng.getrandbits(63)
        # flip a random number of bits (0..8) so distances straddle the cap
        for _ in range(rng.randrange(0, 9)):
            v ^= 1 << rng.randrange(64)
        if v >= 2**63:
            v -= 2**64
        sigs.append((f"d{i:02d}", v))
    sig_df = spark.createDataFrame(sigs, "doc_id string, simhash long")

    got = {
        (r["id1"], r["id2"]): r["hamming"]
        for r in simhash_near_dup(
            None, id_col="doc_id", max_hamming=3, signatures=sig_df
        ).collect()
    }
    want = {}
    for i, (ida, va) in enumerate(sigs):
        for idb, vb in sigs[i + 1:]:
            h = bin((va ^ vb) & (2**64 - 1)).count("1")
            if h <= 3:
                key = (ida, idb) if ida < idb else (idb, ida)
                want[key] = h
    assert got == want and want  # non-trivial fixture


def test_simhash_near_dup_text_path(docs):
    """End-to-end over text: the whitespace/case copy pair (1,2) has
    hamming 0; the one-word-off near-dup (1,3) surfaces at a wider cap."""
    tight = {
        (r["id1"], r["id2"]): r["hamming"]
        for r in simhash_near_dup(docs, max_hamming=0).collect()
    }
    assert tight == {(1, 2): 0}
    wide = {
        (r["id1"], r["id2"]) for r in simhash_near_dup(docs, max_hamming=16).collect()
    }
    assert (1, 3) in wide and (1, 2) in wide
    with pytest.raises(ValueError, match="max_hamming"):
        simhash_near_dup(docs, max_hamming=64)


def test_repetition_scores_hand_checked(spark):
    """Hand-computed Gopher repetition metrics on a 4-line doc with one
    repeated line and a dominant repeated 2-gram."""
    from graphrag_rs_spark.operators.text_analysis import repetition_scores

    text = "spam spam spam spam\nreal content line\nspam spam spam spam\n\nunique tail"
    df = spark.createDataFrame([(1, text), (2, ""), (3, "one two")],
                               "doc_id long, text string")
    rows = {r["doc_id"]: r for r in repetition_scores(df).collect()}

    r = rows[1]
    # 4 non-blank lines, line "spam spam spam spam" appears twice
    assert r["n_lines"] == 4
    assert r["dup_line_frac"] == pytest.approx(1 / 4)
    # repeated occurrence chars = 19; total line chars = 19+17+19+11 = 66
    assert r["dup_line_char_frac"] == pytest.approx(19 / 66)
    # normalized text = "spam spam spam spam real content line spam spam spam spam unique tail"
    # most frequent 2-gram "spam spam" occurs 6 times (3 per spam line,
    # "spam spam" across the line join at positions 7-8... compute directly:
    norm = " ".join(text.lower().split())
    toks = norm.split(" ")
    from collections import Counter
    c2 = Counter(" ".join(toks[i:i+2]) for i in range(len(toks)-1))
    gram, cnt = max(c2.items(), key=lambda kv: (kv[1], ))
    assert r["top_2gram_char_frac"] == pytest.approx(cnt * len(gram) / len(norm))

    # empty doc: all zeros
    assert rows[2]["n_lines"] == 0 and rows[2]["dup_line_frac"] == 0.0
    assert rows[2]["top_2gram_char_frac"] == 0.0
    # doc with 2 tokens has no 3-gram
    assert rows[3]["top_3gram_char_frac"] == 0.0
    assert rows[3]["top_2gram_char_frac"] > 0



def test_benchmark_contamination_planted(spark):
    """A training doc embedding a verbatim benchmark sentence is flagged;
    clean docs and sub-n docs are not; fraction is hand-checkable."""
    from graphrag_rs_spark.operators.dedup import benchmark_contamination

    bench_sent = "alpha beta gamma delta epsilon zeta"  # 6 tokens
    docs = spark.createDataFrame(
        [
            (1, "intro words here " + bench_sent + " trailing words follow now"),
            (2, "totally unrelated content about spark shuffles and parquet files"),
            (3, "alpha beta"),  # shorter than n -> never flagged
        ],
        "doc_id long, text string",
    )
    bench = spark.createDataFrame([(bench_sent,)], "text string")
    rows = {
        r["doc_id"]: r
        for r in benchmark_contamination(docs, bench, n=6).collect()
    }
    assert rows[1]["is_contaminated"]
    # doc 1: 13 tokens -> 8 distinct 6-grams, exactly 1 equals the benchmark
    assert rows[1]["n_grams"] == 8 and rows[1]["contaminated_grams"] == 1
    assert rows[1]["contamination_frac"] == pytest.approx(1 / 8)
    assert not rows[2]["is_contaminated"] and rows[2]["contaminated_grams"] == 0
    assert rows[3]["n_grams"] == 0 and not rows[3]["is_contaminated"]
    assert rows[3]["contaminated_grams"] == 0


