"""HTML layout heuristics — pure-Python port of graphrag-rs
text/parsers/html.rs (HtmlLayoutParser), shared by the Spark enrichment
operator (``layout="html"``) and the pytest oracles.

Semantics ported exactly (html.rs:39-137):

* heading scan is LINE-oriented: a heading registers only when its
  ``<hN`` open tag and ``</hN>`` close tag sit on the SAME line; levels
  are probed 1→6 per line, FIRST occurrence of each level only, so one
  line can yield up to six headings in level order regardless of their
  column positions.
* tag matching is case-insensitive (the reference ``find``s on the
  lowercased line but slices the ORIGINAL line with those indices — on
  ASCII markup the offsets agree; for the rare non-ASCII line where
  Rust's ``to_lowercase`` changes byte length the reference itself
  would mis-slice, and we do not reproduce undefined behavior: offsets
  here always index the original line).
* heading text strips nested tags with a <>-state machine and trims
  (html.rs:21-36); empty text drops the heading.
* recorded offsets: start = line offset + open-tag column; end = line
  offset + close-tag column + len("</hN>"); lines advance offset by
  ``len(line) + 1``.
* sections span heading.end → next heading.start (or EOF); hierarchy is
  the same parent stack as the markdown twin (pop while level >=
  current), matching html.rs:100-137.
"""

from __future__ import annotations

from graphrag_rs_spark.rules.layout import (
    Heading,
    Section,
    sections_from_headings,
)

_FORMATS = ("html", "htm")


def supports_format(fmt: str) -> bool:
    """html.rs:159-161."""
    return fmt.lower() in _FORMATS


def extract_text_content(tag_content: str) -> str:
    """html.rs:21-36 — drop everything between ``<`` and ``>``."""
    out: list[str] = []
    inside_tag = False
    for ch in tag_content:
        if ch == "<":
            inside_tag = True
        elif ch == ">":
            inside_tag = False
        elif not inside_tag:
            out.append(ch)
    return "".join(out).strip()


def parse_html_headings(content: str) -> list[tuple[Heading, int]]:
    """html.rs:39-80 — returns (heading, line_number) pairs."""
    headings: list[tuple[Heading, int]] = []
    offset = 0
    for line_num, line in enumerate(content.split("\n")):
        lower = line.lower()
        for level in range(1, 7):
            open_tag = f"<h{level}"
            close_tag = f"</h{level}>"
            start_idx = lower.find(open_tag)
            if start_idx < 0:
                continue
            end_idx = lower.find(close_tag)
            if end_idx < 0:
                continue
            gt = line[start_idx:].find(">")
            if gt < 0:
                continue
            actual_start = start_idx + gt + 1
            text = extract_text_content(line[actual_start:end_idx])
            if text:
                headings.append((
                    Heading(level, text, offset + start_idx,
                            offset + end_idx + len(close_tag)),
                    line_num,
                ))
        offset += len(line) + 1
    return headings


def parse_html_structure(content: str) -> list[Section]:
    """html.rs:146-157 — headings → sections → parent hierarchy, in the
    repo's shared Section shape (content span = heading.start →
    next-heading.start, as the markdown twin records it)."""
    headings = [h for h, _ in parse_html_headings(content)]
    return sections_from_headings(headings, len(content))
