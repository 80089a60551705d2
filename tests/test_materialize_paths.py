"""repoint_edges: the int-coded aggregation path must be row-identical
to the legacy string-grouped path on ANY input, including foreign inputs
the pipeline never produces (docstring contract, materialize.py:49-61):

* endpoints absent from the cluster linkmap (kept as raw strings),
* NULL endpoints (legacy `subj != obj` null semantics drop them),
* a raw endpoint string equal to a cluster_id it does not map to
  (legacy merges it into the coded group; a mapped endpoint decoding to
  the same string as the other side's raw makes a self-loop),
* a cluster_id present as an entity_id mapping to a DIFFERENT cluster
  (the identity-augment must not override the given mapping).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from graphrag_rs_spark.operators.materialize import repoint_edges


def _rows(df):
    return sorted(
        (r["subj"], r["pred"], r["obj"], round(r["confidence"], 6),
         tuple(r["context"]))
        for r in df.collect()
    )


def _run_both(spark, edges_rows, cluster_rows):
    edges_raw = spark.createDataFrame(
        edges_rows,
        "subj string, pred string, obj string, confidence double, "
        "context_chunk string",
    )
    clusters = spark.createDataFrame(
        cluster_rows, "entity_id string, cluster_id string"
    )
    legacy = repoint_edges(edges_raw, clusters, int_coded_agg=False)
    coded = repoint_edges(edges_raw, clusters, int_coded_agg=True)
    return _rows(legacy), _rows(coded)


class TestIntCodedPathParity:
    def test_pipeline_shaped_input(self, spark):
        legacy, coded = _run_both(
            spark,
            [
                ("e1", "knows", "e2", 0.9, "c1"),
                ("e1", "knows", "e2", 0.8, "c2"),
                ("e2", "near", "e3", 0.7, "c1"),
                ("e1", "knows", "e3", 0.6, "c3"),  # merged -> self-loop
            ],
            [("e1", "e1"), ("e2", "e2"), ("e3", "e1")],
        )
        assert legacy == coded
        assert legacy  # non-trivial

    def test_unmapped_and_null_endpoints(self, spark):
        legacy, coded = _run_both(
            spark,
            [
                ("ghost", "knows", "e2", 0.9, "c1"),   # subj unmapped
                ("e1", "knows", "phantom", 0.8, "c2"),  # obj unmapped
                (None, "knows", "e2", 0.7, "c3"),       # null subj: dropped
                ("e1", "knows", None, 0.6, "c4"),       # null obj: dropped
                ("ghost", "knows", "ghost", 0.5, "c5"),  # raw self-loop
            ],
            [("e1", "e1"), ("e2", "e2")],
        )
        assert legacy == coded
        subjs = {r[0] for r in legacy}
        assert "ghost" in subjs and None not in subjs

    def test_raw_string_collides_with_cluster_id(self, spark):
        # "CLU" is a cluster_id but NOT an entity_id in the linkmap.
        # Legacy groups a raw "CLU" endpoint WITH rows decoded to "CLU"
        # (one output row, contexts unioned) and drops the decoded
        # self-loop (e1 -> raw CLU repoints to CLU -> CLU).
        legacy, coded = _run_both(
            spark,
            [
                ("e1", "knows", "e2", 0.9, "c1"),    # CLU -> e2
                ("CLU", "knows", "e2", 0.4, "c2"),   # raw CLU -> e2: merges
                ("e1", "knows", "CLU", 0.8, "c3"),   # CLU -> CLU self-loop
            ],
            [("e1", "CLU"), ("e2", "e2")],
        )
        assert legacy == coded
        assert legacy == [("CLU", "knows", "e2", 0.9, ("c1", "c2"))]

    def test_identity_augment_does_not_override_mapping(self, spark):
        # Foreign input where cluster_id "X" also exists as an entity_id
        # mapped to a DIFFERENT cluster "Y": the given mapping must win
        # and no duplicate linkmap rows may fan the join out.
        legacy, coded = _run_both(
            spark,
            [
                ("X", "knows", "e2", 0.9, "c1"),
                ("e1", "knows", "e2", 0.7, "c2"),
            ],
            [("e1", "X"), ("e2", "e2"), ("X", "Y"), ("q", "Y")],
        )
        assert legacy == coded
        assert legacy == [
            ("X", "knows", "e2", 0.7, ("c2",)),
            ("Y", "knows", "e2", 0.9, ("c1",)),
        ]
