"""ROGRAG quality metrics: reference vectors + Spark-vs-twin parity.

Ports the reference's unit tests (rograg/quality_metrics.rs:1404-1543)
onto the rule twins, pins hand-derived formula vectors, then
cross-checks the JVM column expressions against the twins.
"""

from __future__ import annotations

import pytest

from graphrag_rs_spark.rules.quality_metrics import (
    coherence_score,
    completeness_score,
    determine_retrieval_strategy,
    improvement_percentage,
    relevance_score,
    response_quality,
    source_credibility,
    statistical_significance,
)

# quality_metrics.rs:1404-1432 (create_test_response)
REF_QUERY = "What is Entity Name?"
REF_CONTENT = "Entity Name is a young boy character in Mark Twain's novels."
REF_SOURCES = ["source1", "source2"]


class TestRuleTwins:
    def test_reference_response_all_positive(self):
        # quality_metrics.rs:1484-1497
        q = response_quality(REF_QUERY, REF_CONTENT, 0.8, REF_SOURCES, 1)
        for k in ("accuracy_score", "completeness_score",
                  "coherence_score", "relevance_score", "overall_quality"):
            assert q[k] > 0.0, k

    def test_improvement_percentage(self):
        # quality_metrics.rs:1518-1531
        assert abs(improvement_percentage(0.8, 0.6) - 33.333) < 0.1
        assert improvement_percentage(0.6, 0.6) == 0.0
        assert improvement_percentage(0.5, 0.7) < 0.0
        # zero-baseline branches (rs:1303-1305)
        assert improvement_percentage(0.5, 0.0) == 100.0
        assert improvement_percentage(0.0, 0.0) == 0.0

    def test_completeness_hand_derived(self):
        # 100-byte content, 2 sources, 1 subquery:
        # (100/500 + 2/3 + 1/5)/3
        content = "x" * 100
        want = (0.2 + 2 / 3 + 0.2) / 3
        assert completeness_score(content, 2, 1) == pytest.approx(want)
        # saturation: 1000 bytes, 9 sources, 9 subqueries → 1.0
        assert completeness_score("y" * 1000, 9, 9) == pytest.approx(1.0)

    def test_coherence_split_keeps_empties(self):
        # "A. B." splits to ["A", " B", ""] → 3 sentences;
        # no transitions → 0; words A. B. distinct → repetition 1.0
        assert coherence_score("A. B.") == pytest.approx(0.5)
        # single piece (no terminator) → trivially coherent
        assert coherence_score("no terminator here") == 1.0
        assert coherence_score("") == 1.0

    def test_coherence_transitions_and_repetition(self):
        # "However x. Therefore x." → pieces ["However x",
        # " Therefore x", ""], 2 transition hits / 3; words: However /
        # x. / Therefore / x. → 4 words, 3 distinct → repetition 3/4
        got = coherence_score("However x. Therefore x.")
        assert got == pytest.approx((2 / 3 + 3 / 4) / 2)

    def test_relevance_hand_derived(self):
        # query words >3 bytes: {"entity", "name?"} — note the '?'
        # sticks to the word (whitespace split); answer contains
        # "entity" and "name" but not "name?" → 1/2
        got = relevance_score("What is Entity Name?",
                              "the entity name is bob")
        # query words >3: {"what", "entity", "name?"} → "what" not in
        # answer, "entity" yes, "name?" no → 1/3
        assert got == pytest.approx(1 / 3)
        assert relevance_score("a is to", "anything") == 1.0

    def test_source_credibility(self):
        assert source_credibility([]) == 0.0
        # 2 sources, prefixes {"sourc"} → (2/5 + 1/2)/2
        assert source_credibility(["source1", "source2"]) \
            == pytest.approx((0.4 + 0.5) / 2)
        # distinct prefixes
        assert source_credibility(["alpha1", "beta22"]) \
            == pytest.approx((0.4 + 1.0) / 2)

    def test_retrieval_strategy_precedence(self):
        # quality_metrics.rs:1106-1129
        assert determine_retrieval_strategy(["fallback", "logic_form"]) \
            == "fallback"
        assert determine_retrieval_strategy(
            ["logic_form", "fuzzy_match"]) == "hybrid"
        assert determine_retrieval_strategy(["logic_form"]) == "logic_form"
        assert determine_retrieval_strategy([]) == "fuzzy_match"

    def test_statistical_significance_heuristic(self):
        ro = {"mean_accuracy": 0.9, "mean_completeness": 0.8,
              "mean_coherence": 0.8, "std_dev_quality": 0.1}
        ba = {"mean_accuracy": 0.5, "mean_completeness": 0.5,
              "mean_coherence": 0.5, "std_dev_quality": 0.1}
        sig = statistical_significance(ro, ba)
        # effect size (0.4/0.1)=4 > 0.5 → p_acc 0.01; both means higher
        # → p 0.05 each; overall (0.01+0.05+0.05)/3 < 0.05 → significant
        assert sig["p_value_accuracy"] == 0.01
        assert sig["is_significant_95"] is True
        same = statistical_significance(ba, ba)
        assert same["p_value_accuracy"] == 0.1
        assert same["is_significant_95"] is False


RESPONSES = [
    (REF_QUERY, REF_CONTENT, 0.8, REF_SOURCES, ["logic_form"], 1000, True,
     False),
    ("Why However?", "However yes. Therefore no. Thus maybe.", 0.5,
     ["a1234x", "b5678y", "a1234z"], ["fuzzy_match", "logic_form"], 12000,
     True, False),
    ("short", "", 0.0, [], [], 50, False, True),
    ("repeat words", "word word word word.", 0.9,
     ["s1", "s2", "s3", "s4", "s5", "s6"], ["fallback"], 9999, True, True),
]

SCHEMA = ("query string, content string, confidence double, "
          "sources array<string>, subquery_types array<string>, "
          "processing_time_ms long, decomposition_success boolean, "
          "fallback_used boolean")


@pytest.mark.usefixtures("spark")
class TestSparkOperators:
    def test_score_responses_matches_twin(self, spark):
        from graphrag_rs_spark.operators.quality_metrics import (
            score_responses,
        )

        df = spark.createDataFrame(RESPONSES, SCHEMA)
        got = {r["query"]: r for r in score_responses(df).collect()}
        for (q, content, conf, sources, subq, *_rest) in RESPONSES:
            want = response_quality(q, content, conf, sources, len(subq))
            row = got[q]
            for k, v in want.items():
                assert row[k] == pytest.approx(v), (q, k)
            assert row["retrieval_strategy"] \
                == determine_retrieval_strategy(subq), q

    def test_aggregate_quality_matches_numpy(self, spark):
        import numpy as np

        from graphrag_rs_spark.operators.quality_metrics import (
            aggregate_quality,
            score_responses,
        )

        scored = score_responses(spark.createDataFrame(RESPONSES, SCHEMA))
        agg = aggregate_quality(scored).collect()[0]
        overall = [
            response_quality(q, c, cf, s, len(t))["overall_quality"]
            for (q, c, cf, s, t, *_r) in RESPONSES
        ]
        assert agg["n"] == len(RESPONSES)
        assert agg["std_dev_quality"] == pytest.approx(
            float(np.std(overall)))  # population std-dev, rs:1286-1288
        assert agg["success_rate"] == pytest.approx(3 / 4)
        assert agg["mean_processing_time_ms"] == pytest.approx(
            (1000 + 12000 + 50 + 9999) / 4)

    def test_comparative_analysis(self, spark):
        from graphrag_rs_spark.operators.quality_metrics import (
            comparative_analysis,
            score_responses,
        )

        good = score_responses(spark.createDataFrame(
            RESPONSES[:2], SCHEMA))
        weak = score_responses(spark.createDataFrame(
            RESPONSES[2:], SCHEMA))
        out = comparative_analysis(good, weak)
        assert out["improvement_percentages"][
            "accuracy_improvement"] > 0.0
        sig = out["statistical_significance"]
        assert set(sig) == {
            "p_value_accuracy", "p_value_completeness",
            "p_value_coherence", "p_value_overall", "is_significant_95",
            "effect_size"}

    def test_quality_alerts(self, spark):
        from graphrag_rs_spark.operators.quality_metrics import (
            quality_alerts,
            score_responses,
        )

        scored = score_responses(spark.createDataFrame(RESPONSES, SCHEMA))
        alerts = quality_alerts(scored).collect()
        by_type = {}
        for a in alerts:
            by_type.setdefault(a["alert_type"], []).append(a)
        # the 12000 ms row breaches the 10 s default
        slow = by_type["performance_degradation"]
        assert [a["query"] for a in slow] == ["Why However?"]
        assert slow[0]["message"] == "Slow processing: 12000ms"
        # every low-quality alert matches the twin's verdict
        for a in by_type.get("quality_degradation", []):
            q = a["query"]
            spec = next(r for r in RESPONSES if r[0] == q)
            want = response_quality(
                spec[0], spec[1], spec[2], spec[3], len(spec[4]))
            assert want["overall_quality"] < 0.6
            assert a["severity"] == "high"
