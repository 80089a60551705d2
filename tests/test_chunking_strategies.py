"""Trait-style chunking strategies (text/chunking_strategies.rs)."""

from __future__ import annotations

import pytest

from graphrag_rs_spark.operators.chunking_strategies import (
    code_item_chunks,
    find_code_items,
    sentence_group_fallback,
)

RUST_CODE = """
fn main() {
    println!("Hello, world!");
}

struct Point {
    x: f64,
    y: f64,
}

impl Point {
    fn new(x: f64, y: f64) -> Self {
        Point { x, y }
    }
}
"""


class TestPureFunctions:
    def test_sentence_group_fallback(self):
        # chunking_strategies.rs:96-130 — 6 sentences → chunks of 5 + 1
        text = ("First one. Second one! Third one? Fourth one. "
                "Fifth one. Sixth one.")
        chunks = sentence_group_fallback(text, "d")
        assert len(chunks) == 2
        ids = [c[0] for c in chunks]
        assert ids == ["d_0", "d_1"]
        # first chunk joins 5 pieces with ". " (4 dots) + final "."
        assert chunks[0][2].count(".") == 5
        assert chunks[0][2].endswith(".")
        assert chunks[1][2].strip() == "Sixth one."
        # offsets are cumulative over rebuilt content
        assert chunks[0][3] == 0
        assert chunks[0][4] == len(chunks[0][2].encode())
        assert chunks[1][3] == chunks[0][4]

    def test_sentence_group_empty(self):
        assert sentence_group_fallback("", "d") == []
        assert sentence_group_fallback("...!?", "d") == []

    def test_code_items_reference_vector(self):
        # chunking_strategies.rs:280-313 — finds main, Point, impl
        chunks = code_item_chunks(RUST_CODE, "rust_code")
        assert len(chunks) >= 2
        texts = [c[2] for c in chunks]
        assert any(t.startswith("fn main()") for t in texts)
        assert any(t.startswith("struct Point") for t in texts)
        assert any(t.startswith("impl Point") for t in texts)
        for c in chunks:
            assert c[2]
            assert c[3] < c[4]

    def test_code_min_size_gate_and_fallback(self):
        # all items below min size → fall back to one whole-text chunk
        tiny = "fn f() {}\n"
        chunks = code_item_chunks(tiny, "d", min_chunk_size=1000)
        assert len(chunks) == 1
        assert chunks[0][2] == tiny
        assert chunks[0][0] == "d_0"
        # expressions only (no items) → whole-text chunk (rs:172-183)
        expr = "let x = 1 + 2;\n"
        chunks2 = code_item_chunks(expr, "d")
        assert len(chunks2) == 1 and chunks2[0][2] == expr
        assert code_item_chunks("   \n", "d") == []

    def test_unit_struct_semicolon_terminated(self):
        src = "struct Unit;\nfn after() {\n    body();\n}\n"
        spans = find_code_items(src)
        assert len(spans) == 2
        raw = src.encode()
        assert raw[spans[0][0]:spans[0][1]].decode() == "struct Unit;"
        assert raw[spans[1][0]:spans[1][1]].decode().startswith(
            "fn after()")

    def test_pub_async_prefixes(self):
        src = ("pub async fn go() {\n    x();\n}\n"
               "pub(crate) struct S {\n    a: u8,\n}\n")
        spans = find_code_items(src)
        assert len(spans) == 2


@pytest.mark.usefixtures("spark")
class TestSparkOperators:
    def test_sentence_group_chunks(self, spark):
        from graphrag_rs_spark.operators.chunking_strategies import (
            sentence_group_chunks,
        )

        docs = spark.createDataFrame(
            [("d1", "One. Two. Three. Four. Five. Six."),
             ("d2", ""), ("d3", None)],
            "doc_id string, text string")
        got = {}
        for r in sentence_group_chunks(docs).collect():
            got.setdefault(r["doc_id"], []).append(r)
        assert "d2" not in got and "d3" not in got
        want = sentence_group_fallback("One. Two. Three. Four. Five. Six.",
                                       "d1")
        rows = sorted(got["d1"], key=lambda r: r["start"])
        assert [(r["chunk_id"], r["text"], r["start"], r["end"])
                for r in rows] == [(c[0], c[2], c[3], c[4]) for c in want]

    def test_code_chunks(self, spark):
        from graphrag_rs_spark.operators.chunking_strategies import (
            code_chunks,
        )

        docs = spark.createDataFrame(
            [("r1", RUST_CODE)], "doc_id string, text string")
        rows = code_chunks(docs).collect()
        want = code_item_chunks(RUST_CODE, "r1")
        assert sorted(r["text"] for r in rows) == sorted(
            c[2] for c in want)
        assert len(rows) >= 3
