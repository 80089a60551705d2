"""Plain-text layout heuristics — pure-Python ports of graphrag-rs
text/analysis.rs (TextAnalyzer) and text/parsers/plaintext.rs
(PlainTextLayoutParser), shared by the Spark enrichment operator and the
pytest oracles.

Semantics ported exactly:

* heading detection (analysis.rs:22-62): markdown ``#..###### `` requires
  a SPACE after the hashes (stricter than the markdown parser in
  rules/layout.py, which also accepts a bare ``#``); ALL-CAPS lines of
  length >= 5 map to level 1/2/3 by length (<20 / <40 / else); otherwise
  a leading section number's depth (1-6) is the level.
* section numbers (analysis.rs:79-185): decimal ``1.2.3``, keyword
  ``Chapter 1`` / ``Section IV`` / ``Appendix A`` (case-insensitive — a
  lowercase roman/alpha numeral after the keyword parses as NOTHING, the
  Rust falls through every branch), bare roman ``IV.``, bare alpha
  ``B.``; each requires trailing whitespace after the optional ``.``/``:``.
* roman numerals (analysis.rs:188-214): reverse scan, subtract when a
  value is smaller than its right neighbour; any non-numeral char → None.
* underline headings (analysis.rs:281-299): a line of >= 3 ``=`` is
  level 1, ``-`` level 2, ``_`` level 3.
* the parse loop (plaintext.rs:84-135) carries two offset-bookkeeping
  quirks that are ported verbatim because section spans must match the
  reference byte-for-byte:
  - an underlined heading advances the offset by the heading line PLUS
    the TRIMMED underline length before the Heading is built, so its
    recorded start points past itself (plaintext.rs:103-109);
  - an inline-detected heading (ALL CAPS / numbered) does NOT advance
    the offset at all (plaintext.rs:128-130), shifting every later
    offset left by the heading line's length.
"""

from __future__ import annotations

import re

from graphrag_rs_spark.rules.layout import (
    Heading,
    Section,
    sections_from_headings,
)

_DECIMAL_RE = re.compile(r"^(\d+(?:\.\d+)*)\s*[.:]?\s")
_ROMAN_RE = re.compile(r"^([IVXLCDM]+)[.:]?\s")
_ALPHA_RE = re.compile(r"^([A-Z])[.:]?\s")
_CHAPTER_RE = re.compile(
    r"^(chapter|section|part|appendix)\s+(\d+|[IVXLCDM]+|[A-Z])\b",
    re.IGNORECASE,
)

_ROMAN_VALUES = {"I": 1, "V": 5, "X": 10, "L": 50, "C": 100, "D": 500,
                 "M": 1000}


def parse_roman_numeral(roman: str) -> int | None:
    """analysis.rs:188-214 — reverse scan with subtractive pairs."""
    result = 0
    prev_value = 0
    for ch in reversed(roman):
        value = _ROMAN_VALUES.get(ch)
        if value is None:
            return None
        if value < prev_value:
            result -= value
        else:
            result += value
        prev_value = value
    return result


def is_all_caps(text: str) -> bool:
    """analysis.rs:65-68 — every alphabetic char uppercase, at least one."""
    letters = [c for c in text if c.isalpha()]
    return bool(letters) and all(c.isupper() for c in letters)


def extract_section_number(text: str) -> dict | None:
    """analysis.rs:79-185 → {raw, format, components} or None."""
    m = _DECIMAL_RE.match(text)
    if m:
        components = [int(s) for s in m.group(1).split(".") if s.isdigit()]
        if components:
            return {"raw": m.group(1), "format": "decimal",
                    "components": components}

    m = _CHAPTER_RE.match(text)
    if m:
        num_str = m.group(2)
        if num_str.isdigit():
            return {"raw": f"{m.group(1)} {num_str}", "format": "mixed",
                    "components": [int(num_str)]}
        roman = parse_roman_numeral(num_str)
        if roman is not None:
            return {"raw": f"{m.group(1)} {num_str}", "format": "mixed",
                    "components": [roman]}
        if len(num_str) == 1 and "A" <= num_str <= "Z":
            return {"raw": f"{m.group(1)} {num_str}", "format": "mixed",
                    "components": [ord(num_str) - ord("A") + 1]}
        # the Rust falls through (e.g. lowercase roman under (?i)) and the
        # later bare-roman/alpha regexes can't match the keyword prefix
        return None

    m = _ROMAN_RE.match(text)
    if m:
        roman = parse_roman_numeral(m.group(1))
        if roman is not None:
            return {"raw": m.group(1), "format": "roman",
                    "components": [roman]}

    m = _ALPHA_RE.match(text)
    if m:
        ch = m.group(1)
        return {"raw": ch, "format": "alphabetic",
                "components": [ord(ch) - ord("A") + 1]}

    return None


def detect_heading_level(line: str) -> int | None:
    """analysis.rs:22-62 — markdown, then ALL CAPS, then numbered."""
    trimmed = line.strip()
    if not trimmed:
        return None

    if trimmed.startswith("#"):
        level = len(trimmed) - len(trimmed.lstrip("#"))
        if 0 < level <= 6 and len(trimmed) > level and trimmed[level] == " ":
            return level

    if len(trimmed) >= 5 and is_all_caps(trimmed):
        if len(trimmed) < 20:
            return 1
        if len(trimmed) < 40:
            return 2
        return 3

    sec = extract_section_number(trimmed)
    if sec is not None:
        depth = len(sec["components"])
        if 0 < depth <= 6:
            return depth

    return None


def is_underline(line: str) -> int | None:
    """analysis.rs:281-299 — ===/---/___ of length >= 3."""
    trimmed = line.strip()
    if len(trimmed) < 3:
        return None
    if all(c == "=" for c in trimmed):
        return 1
    if all(c == "-" for c in trimmed):
        return 2
    if all(c == "_" for c in trimmed):
        return 3
    return None


def find_blank_line_positions(text: str) -> list[int]:
    """analysis.rs:217-235 — offset of the FIRST line of each blank run."""
    positions: list[int] = []
    current_offset = 0
    prev_was_blank = False
    for line in text.split("\n"):
        is_blank = not line.strip()
        if is_blank and not prev_was_blank:
            positions.append(current_offset)
        prev_was_blank = is_blank
        current_offset += len(line) + 1
    return positions


def calculate_statistics(text: str) -> dict:
    """analysis.rs:238-278 — word/sentence/paragraph/char counts."""
    words = text.split()
    word_count = len(words)
    sentence_count = max(sum(1 for c in text if c in ".!?"), 1)
    paragraph_count = max(
        sum(1 for p in text.split("\n\n") if p.strip()), 1
    )
    char_count = len(text)
    return {
        "word_count": word_count,
        "sentence_count": sentence_count,
        "paragraph_count": paragraph_count,
        "char_count": char_count,
        "avg_sentence_length": (
            word_count / sentence_count if sentence_count else 0.0
        ),
        "avg_word_length": char_count / word_count if word_count else 0.0,
    }


def extract_title(text: str) -> str | None:
    """analysis.rs:302-330 — first ALL-CAPS / heading / long line of 10."""
    for line in text.split("\n")[:10]:
        trimmed = line.strip()
        if not trimmed:
            continue
        if is_all_caps(trimmed) and len(trimmed) < 100:
            return trimmed
        if detect_heading_level(line) is not None:
            clean = trimmed.lstrip("#")
            clean = clean.lstrip("0123456789.").strip()
            if clean:
                return clean
        if len(trimmed) > 5:
            return trimmed
    return None


def parse_plaintext_structure(content: str) -> list[Section]:
    """plaintext.rs:84-150 — heuristic headings → sections + hierarchy.

    Emits the same ``rules.layout.Section`` objects the markdown parser
    does (content span = [this heading's recorded end, next heading's
    recorded start); ``contains_offset`` checks
    [heading.start, content_end), identical to the reference's
    Section::contains_offset, document_structure.rs:103-105).
    """
    headings: list[Heading] = []
    lines = content.split("\n")
    current_offset = 0

    i = 0
    while i < len(lines):
        line = lines[i]
        trimmed = line.strip()

        if not trimmed:
            current_offset += len(line) + 1
            i += 1
            continue

        detected_level: int | None = None

        if i + 1 < len(lines):
            next_line = lines[i + 1].strip()
            level = is_underline(next_line)
            if level is not None:
                detected_level = level
                # reference quirk: offset advances past heading + TRIMMED
                # underline BEFORE the heading is built (plaintext.rs:103-109)
                i += 1
                current_offset += len(line) + 1
                current_offset += len(next_line) + 1

        if detected_level is None:
            detected_level = detect_heading_level(line)

        if detected_level is not None:
            headings.append(
                Heading(detected_level, trimmed, current_offset,
                        current_offset + len(line))
            )

        if detected_level is None:
            # reference quirk: inline-detected headings do NOT advance the
            # offset (plaintext.rs:128-130)
            current_offset += len(line) + 1

        i += 1

    return sections_from_headings(headings, len(content))
