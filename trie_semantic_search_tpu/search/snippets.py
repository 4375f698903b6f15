"""Snippet + highlight generation.

The reference declared snippets and highlights in its result types but left
both unimplemented (``/root/reference/src/search.rs:277-281`` returns a
placeholder; highlights TODO at ``search.rs:200,220``). Implemented for
real here: term-anchored context windows with word-boundary highlight
spans.
"""

from __future__ import annotations

import re
from dataclasses import dataclass
from enum import Enum
from typing import Optional, Sequence


class HighlightType(str, Enum):
    """ref: search.rs:96-102."""

    EXACT_MATCH = "exact_match"
    SEMANTIC_MATCH = "semantic_match"
    CASE_NAME = "case_name"
    CITATION = "citation"


@dataclass(slots=True)
class TextHighlight:
    """ref: search.rs:84-93 — span within the snippet."""

    start: int
    end: int
    highlight_type: HighlightType


def _term_pattern(terms: Sequence[str]) -> Optional[re.Pattern[str]]:
    words = [re.escape(t) for t in terms if t]
    if not words:
        return None
    return re.compile(r"\b(" + "|".join(words) + r")\b", re.IGNORECASE)


_SENTENCE_SPLIT = re.compile(r"[.!?]+\s+")


def _sentence_offsets(text: str) -> list[int]:
    """Start offsets of sentences (same split rule as the text processor)."""
    offsets = [0]
    for m in _SENTENCE_SPLIT.finditer(text):
        offsets.append(m.end())
    return offsets


def generate_snippet(
    text: str,
    query: str,
    window: int = 240,
    highlight_type: HighlightType = HighlightType.EXACT_MATCH,
    paragraph_hint: Optional[int] = None,
) -> tuple[str, list[TextHighlight]]:
    """Context window around the first query-term hit, with highlight spans
    for every term occurrence inside the window.

    When no term matches (semantic-only hits), anchors on the matched chunk
    via ``paragraph_hint`` (the hit's sentence index — the DocRef
    ``paragraph_index`` the reference carried but never used for snippets),
    else falls back to the leading ``window`` characters.
    """
    if not text:
        return "", []
    pattern = _term_pattern(query.split())
    anchor = None
    if pattern:
        m = pattern.search(text)
        if m:
            anchor = m.start()

    if anchor is None and paragraph_hint is not None and paragraph_hint > 0:
        offsets = _sentence_offsets(text)
        if paragraph_hint < len(offsets):
            anchor = offsets[paragraph_hint]

    if anchor is None:
        snippet = text[:window]
        cut = snippet.rfind(" ")
        if 0 < cut < len(snippet) and len(text) > window:
            snippet = snippet[:cut]
        return (snippet + ("..." if len(text) > len(snippet) else ""), [])
    if pattern is None or not pattern.search(text):
        # paragraph-anchored, no term highlights
        start = anchor
        end = min(len(text), start + window)
        sp = text.rfind(" ", start, end)
        if sp > start and end < len(text):
            end = sp
        prefix = "..." if start > 0 else ""
        suffix = "..." if end < len(text) else ""
        return prefix + text[start:end] + suffix, []

    start = max(0, anchor - window // 3)
    end = min(len(text), start + window)
    # align to word boundaries
    if start > 0:
        sp = text.find(" ", start)
        if 0 <= sp < anchor:
            start = sp + 1
    if end < len(text):
        sp = text.rfind(" ", start, end)
        if sp > start:
            end = sp

    prefix = "..." if start > 0 else ""
    suffix = "..." if end < len(text) else ""
    body = text[start:end]
    snippet = prefix + body + suffix

    highlights: list[TextHighlight] = []
    if pattern:
        offset = len(prefix) - start
        for m in pattern.finditer(body):
            highlights.append(
                TextHighlight(
                    start=m.start() + len(prefix),
                    end=m.end() + len(prefix),
                    highlight_type=highlight_type,
                )
            )
    return snippet, highlights
