"""HTML layout parser: reference vectors + enrichment integration.

Ports the reference's unit tests (text/parsers/html.rs:172-240) onto the
rule twin, pins the offset bookkeeping, and runs the enrichment operator
with ``layout="html"`` end-to-end on a small HTML document.
"""

from __future__ import annotations

import pytest

from graphrag_rs_spark.rules.html_layout import (
    extract_text_content,
    parse_html_headings,
    parse_html_structure,
    supports_format,
)

HTML_DOC = """
<html>
<body>
<h1>Chapter 1: Introduction</h1>
<p>Some introductory text.</p>
<h2>Section 1.1: Background</h2>
<p>Background information.</p>
<h3>Subsection 1.1.1: Details</h3>
<p>Detailed information.</p>
<h2>Section 1.2: Methods</h2>
<p>Methodology.</p>
</body>
</html>
"""


class TestRuleTwin:
    def test_html_heading_parsing(self):
        # html.rs:172-201
        sections = parse_html_structure(HTML_DOC)
        heads = [s.heading for s in sections]
        assert len(heads) == 4
        assert (heads[0].level, heads[0].text) == (
            1, "Chapter 1: Introduction")
        assert (heads[1].level, heads[1].text) == (
            2, "Section 1.1: Background")
        assert (heads[2].level, heads[2].text) == (
            3, "Subsection 1.1.1: Details")
        assert (heads[3].level, heads[3].text) == (
            2, "Section 1.2: Methods")

    def test_html_hierarchy(self):
        # html.rs:203-220
        content = "<h1>Main</h1>\n<h2>Sub1</h2>\n<h3>SubSub1</h3>\n<h2>Sub2</h2>"
        sections = parse_html_structure(content)
        assert len(sections) == 4
        roots = [i for i, s in enumerate(sections) if s.parent is None]
        assert roots == [0]
        assert sections[1].parent == 0
        assert sections[2].parent == 1
        assert sections[3].parent == 0
        assert sections[0].children == [1, 3]

    def test_nested_tags_in_heading(self):
        # html.rs:222-231
        content = "<h1>Chapter <em>One</em></h1><p>Content</p>"
        sections = parse_html_structure(content)
        assert len(sections) == 1
        assert sections[0].heading.text == "Chapter One"

    def test_format_support(self):
        # html.rs:233-240
        assert supports_format("html")
        assert supports_format("HTML")
        assert supports_format("htm")
        assert not supports_format("md")

    def test_extract_text_content_state_machine(self):
        # html.rs:21-36
        assert extract_text_content("a <b>bold</b> c") == "a bold c"
        assert extract_text_content("<span>") == ""
        assert extract_text_content("  plain  ") == "plain"

    def test_offsets_and_line_numbers(self):
        # html.rs:64-67,76: start = line offset + open-tag column;
        # end = close-tag column + len("</hN>"); lines advance len+1
        content = 'xx<h1 class="t">Title</h1>yy\n<h2>Sub</h2>'
        pairs = parse_html_headings(content)
        assert [(h.level, h.text, ln) for h, ln in pairs] == [
            (1, "Title", 0), (2, "Sub", 1)]
        h1, h2 = pairs[0][0], pairs[1][0]
        assert h1.start == 2
        assert h1.end == content.find("</h1>") + len("</h1>")
        line2_off = content.find("\n") + 1
        assert h2.start == line2_off
        assert h2.end == len(content)

    def test_open_close_must_share_line(self):
        # the reference's line-oriented scan misses multi-line headings
        assert parse_html_structure("<h1>Split\nTitle</h1>") == []

    def test_one_heading_per_level_per_line(self):
        # only the FIRST <h2> on a line registers; probe order is by level
        content = "<h2>B</h2><h1>A</h1><h2>C</h2>"
        heads = [s.heading for s in parse_html_structure(content)]
        assert [(h.level, h.text) for h in heads] == [(1, "A"), (2, "B")]


@pytest.mark.usefixtures("spark")
class TestEnrichmentIntegration:
    def test_enrich_chunks_html_layout(self, spark):
        from graphrag_rs_spark.operators.enrichment import enrich_chunks

        full_text = HTML_DOC
        docs = spark.createDataFrame(
            [("d1", full_text)], "doc_id string, full_text string")
        # one chunk inside "Section 1.1", one inside "Section 1.2"
        s11 = full_text.find("<p>Background")
        s12 = full_text.find("<p>Methodology")
        chunks = spark.createDataFrame(
            [
                ("c1", "d1", "Background information.", s11),
                ("c2", "d1", "Methodology.", s12),
            ],
            "chunk_id string, doc_id string, text string, start long",
        )
        got = {r["chunk_id"]: r for r in
               enrich_chunks(chunks, docs, layout="html").collect()}
        assert got["c1"]["chapter"] == "Chapter 1: Introduction"
        assert got["c1"]["section"] == "Section 1.1: Background"
        assert got["c2"]["section"] == "Section 1.2: Methods"
        assert list(got["c1"]["heading_path"]) == [
            "Chapter 1: Introduction", "Section 1.1: Background"]

    def test_enrich_rejects_unknown_layout(self, spark):
        from graphrag_rs_spark.operators.enrichment import enrich_chunks

        df = spark.createDataFrame([("d", "t")],
                                   "doc_id string, full_text string")
        with pytest.raises(ValueError):
            enrich_chunks(df, df, layout="latex")
