"""Markdown layout parsing + chunk-metadata rules — pure-Python ports of
graphrag-rs text/parsers/markdown.rs, text/document_structure.rs, and
text/chunk_enricher.rs (shared by the Spark enrichment operator and the
pytest oracles).

Semantics ported exactly:

* headings: lines whose trimmed form starts with 1-6 ``#`` followed by a
  space (or nothing), non-empty text (markdown.rs:85-110); offsets are
  line offsets (``+1`` per newline, markdown.rs:113).
* sections: one per heading; content spans from the heading's end to the
  NEXT heading's start regardless of level (markdown.rs:18-31), so section
  spans partition the document after the first heading.
* hierarchy: stack-based — a section's parent is the nearest earlier
  section with a strictly smaller level (markdown.rs:35-57).
* a chunk belongs to the first section whose
  ``[heading.start, content_end)`` contains its start offset
  (document_structure.rs:103-105, 178-182); the heading path walks parents
  root-to-leaf (document_structure.rs:188-206).
* metadata (chunk_enricher.rs:82-141): chapter/section/subsection =
  path[0..3], structural_level = the section's heading level, keywords =
  top-5, summary when len > 150 (max 150 chars), position = start/len(doc),
  confidence = completeness_score (metadata.rs:166-199: 9 fields, topic
  never set here).
"""

from __future__ import annotations

from dataclasses import dataclass, field


@dataclass
class Heading:
    level: int
    text: str
    start: int
    end: int


@dataclass
class Section:
    heading: Heading
    content_end: int
    parent: int | None = None
    children: list[int] = field(default_factory=list)

    def contains_offset(self, offset: int) -> bool:
        return self.heading.start <= offset < self.content_end


def parse_markdown_structure(content: str) -> list[Section]:
    headings: list[Heading] = []
    offset = 0
    for line in content.split("\n"):
        trimmed = line.strip()
        if trimmed.startswith("#"):
            level = len(trimmed) - len(trimmed.lstrip("#"))
            if 1 <= level <= 6 and (
                len(trimmed) == level or trimmed[level] == " "
            ):
                text = trimmed[level:].strip()
                if text:
                    headings.append(
                        Heading(level, text, offset, offset + len(line))
                    )
        offset += len(line) + 1

    return sections_from_headings(headings, len(content))


def sections_from_headings(
    headings: list[Heading], content_len: int
) -> list[Section]:
    """Section spans + parent/children hierarchy from an ordered heading
    list — the single definition shared by the markdown, HTML and
    plaintext layout parsers (each previously carried its own copy of
    this stack loop, which could drift independently)."""
    sections = [
        Section(
            h,
            headings[i + 1].start if i + 1 < len(headings) else content_len,
        )
        for i, h in enumerate(headings)
    ]
    stack: list[int] = []
    for idx, sec in enumerate(sections):
        while stack and sections[stack[-1]].heading.level >= sec.heading.level:
            stack.pop()
        if stack:
            sec.parent = stack[-1]
            sections[stack[-1]].children.append(idx)
        stack.append(idx)
    return sections


def section_for_offset(sections: list[Section], offset: int) -> int | None:
    for idx, sec in enumerate(sections):
        if sec.contains_offset(offset):
            return idx
    return None


def heading_path(sections: list[Section], idx: int) -> list[str]:
    path: list[str] = []
    cur: int | None = idx
    while cur is not None:
        path.append(sections[cur].heading.text)
        cur = sections[cur].parent
    path.reverse()
    return path


def chunk_metadata(
    sections: list[Section],
    chunk_start: int,
    chunk_text: str,
    doc_length: int,
    keywords: list[str],
    summary: str | None,
) -> dict:
    """The enrich_single_chunk field assembly (chunk_enricher.rs:82-141)."""
    chapter = section = subsection = None
    path: list[str] = []
    level = None
    sec_idx = section_for_offset(sections, chunk_start)
    if sec_idx is not None:
        path = heading_path(sections, sec_idx)
        chapter = path[0] if path else None
        section = path[1] if len(path) > 1 else None
        subsection = path[2] if len(path) > 2 else None
        level = sections[sec_idx].heading.level

    position = chunk_start / max(doc_length, 1)
    # completeness_score (metadata.rs:166-199): 9 slots; topic never set
    score = sum(
        [
            chapter is not None,
            section is not None,
            subsection is not None,
            False,  # topic
            bool(keywords),
            summary is not None,
            level is not None,
            True,  # position always set
            bool(path),
        ]
    ) / 9.0
    return {
        "chapter": chapter,
        "section": section,
        "subsection": subsection,
        "keywords": keywords,
        "summary": summary,
        "structural_level": level,
        "position_in_document": position,
        "heading_path": path,
        "meta_confidence": score,
    }
