"""String-similarity metrics for entity linking.

Exact port of graphrag-rs's StringSimilarityLinker metric suite
(entity/string_similarity_linker.rs):

* normalize_string        — rs:171-190
* levenshtein_distance    — rs:209-248
* levenshtein_similarity  — rs:193-206 (0.0 beyond max_edit_distance)
* jaro_similarity         — rs:267-326
* jaro_winkler_similarity — rs:252-264 (prefix bonus 0.1, max prefix 4)
* token Jaccard           — rs:329-345
* soundex                 — rs:360-409 (4-char, zero-padded)
* pair_similarity         — rs:130-168 (type gate, exact=1.0, max-of-metrics)

All positions are Python character indexes; the reference mixes byte and
char indexing but is only exercised on ASCII, where they coincide.
"""

from __future__ import annotations


def normalize_string(s: str, case_insensitive: bool = True, remove_punctuation: bool = True) -> str:
    """rs:171-190 — lowercase, keep alnum+whitespace, squash whitespace."""
    if case_insensitive:
        s = s.lower()
    if remove_punctuation:
        s = "".join(c for c in s if c.isalnum() or c.isspace())
    return " ".join(s.split())


def levenshtein_distance(s1: str, s2: str) -> int:
    """rs:209-248 — classic DP edit distance (two-row variant, same result)."""
    len1, len2 = len(s1), len(s2)
    if len1 == 0:
        return len2
    if len2 == 0:
        return len1
    prev = list(range(len2 + 1))
    cur = [0] * (len2 + 1)
    for i in range(1, len1 + 1):
        cur[0] = i
        c1 = s1[i - 1]
        for j in range(1, len2 + 1):
            cost = 0 if c1 == s2[j - 1] else 1
            cur[j] = min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + cost)
        prev, cur = cur, prev
    return prev[len2]


def levenshtein_within(s1: str, s2: str, k: int) -> int:
    """Banded edit distance: the exact Levenshtein d when d <= k, else any
    value > k (Ukkonen band of width 2k+1 with early abandon). The scoring
    hot loop only ever asks "is d within the cap?", so the full O(n·m) DP
    is wasted work for the overwhelmingly-dissimilar majority of candidate
    pairs."""
    len1, len2 = len(s1), len(s2)
    if abs(len1 - len2) > k:
        return k + 1
    if len1 == 0 or len2 == 0:
        return max(len1, len2)
    big = k + 1
    prev = [j if j <= k else big for j in range(len2 + 1)]
    for i in range(1, len1 + 1):
        lo = max(1, i - k)
        hi = min(len2, i + k)
        cur = [big] * (len2 + 1)
        if lo == 1:
            cur[0] = i if i <= k else big
        c1 = s1[i - 1]
        row_min = cur[0] if lo == 1 else big
        for j in range(lo, hi + 1):
            cost = 0 if c1 == s2[j - 1] else 1
            v = min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + cost)
            if v > big:
                v = big
            cur[j] = v
            if v < row_min:
                row_min = v
        if row_min > k:
            return big
        prev = cur
    return prev[len2]


def levenshtein_similarity(s1: str, s2: str, max_edit_distance: int = 2) -> float:
    """rs:193-206 — 1 - d/max_len, but 0.0 when d exceeds the cap."""
    d = levenshtein_within(s1, s2, max_edit_distance)
    if d > max_edit_distance:
        return 0.0
    max_len = max(len(s1), len(s2))
    if max_len == 0:
        return 1.0
    return 1.0 - d / max_len


def jaro_similarity(s1: str, s2: str) -> float:
    """rs:267-326."""
    len1, len2 = len(s1), len(s2)
    if len1 == 0 and len2 == 0:
        return 1.0
    if len1 == 0 or len2 == 0:
        return 0.0
    match_distance = max(max(len1, len2) // 2 - 1, 0)
    s1_matches = [False] * len1
    s2_matches = [False] * len2
    matches = 0
    for i in range(len1):
        start = max(i - match_distance, 0)
        end = min(i + match_distance + 1, len2)
        for j in range(start, end):
            if s2_matches[j] or s1[i] != s2[j]:
                continue
            s1_matches[i] = True
            s2_matches[j] = True
            matches += 1
            break
    if matches == 0:
        return 0.0
    transpositions = 0
    k = 0
    for i in range(len1):
        if not s1_matches[i]:
            continue
        while not s2_matches[k]:
            k += 1
        if s1[i] != s2[k]:
            transpositions += 1
        k += 1
    m = float(matches)
    return (m / len1 + m / len2 + (m - transpositions / 2.0) / m) / 3.0


def jaro_winkler_similarity(s1: str, s2: str) -> float:
    """rs:252-264 — Winkler prefix bonus over the first ≤4 chars."""
    jaro = jaro_similarity(s1, s2)
    prefix_len = 0
    for c1, c2 in zip(s1[:4], s2[:4]):
        if c1 != c2:
            break
        prefix_len += 1
    return jaro + prefix_len * 0.1 * (1.0 - jaro)


def jaccard_similarity(s1: str, s2: str) -> float:
    """rs:329-345 — whitespace-token Jaccard."""
    t1 = set(s1.split())
    t2 = set(s2.split())
    if not t1 and not t2:
        return 1.0
    union = len(t1 | t2)
    if union == 0:
        return 0.0
    return len(t1 & t2) / union


_SOUNDEX_CODES = {
    **dict.fromkeys("BFPV", "1"),
    **dict.fromkeys("CGJKQSXZ", "2"),
    **dict.fromkeys("DT", "3"),
    "L": "4",
    **dict.fromkeys("MN", "5"),
    "R": "6",
}


def soundex(s: str) -> str:
    """rs:360-409 — simplified Soundex, keep first letter, 4 chars, 0-padded."""
    if not s:
        return ""
    chars = s.upper()
    result = chars[0] if chars[0].isalpha() else ""
    prev_code = _SOUNDEX_CODES.get(chars[0], "0")
    for c in chars[1:]:
        code = _SOUNDEX_CODES.get(c, "0")
        # NOTE (reference quirk, rs:377-388): prev_code is ONLY updated on
        # emit — a vowel does NOT reset it, so "BOB" → "B000", not "B100".
        if code != "0" and code != prev_code:
            result += code
            prev_code = code
        if len(result) >= 4:
            break
    return (result + "0000")[:4]


def phonetic_similarity(s1: str, s2: str) -> float:
    """rs:348-357 — 0.9 on Soundex match else 0.0."""
    return 0.9 if soundex(s1) == soundex(s2) else 0.0


def pair_similarity(
    name1: str,
    name2: str,
    type1: str,
    type2: str,
    *,
    max_edit_distance: int = 2,
    use_phonetic: bool = False,
    fuzzy_matching: bool = True,
    pre_normalized: bool = False,
) -> float:
    """rs:130-168 — max over enabled metrics; 0.0 across types; 1.0 on
    normalized exact match."""
    if type1 != type2:
        return 0.0
    n1 = name1 if pre_normalized else normalize_string(name1)
    n2 = name2 if pre_normalized else normalize_string(name2)
    if n1 == n2:
        return 1.0
    best = 0.0
    if fuzzy_matching:
        best = max(best, levenshtein_similarity(n1, n2, max_edit_distance))
    best = max(best, jaro_winkler_similarity(n1, n2))
    best = max(best, jaccard_similarity(n1, n2))
    if use_phonetic:
        best = max(best, phonetic_similarity(n1, n2))
    return best
