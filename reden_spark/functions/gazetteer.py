"""Longest-match gazetteer mention detector.

Replaces the reference's XPath tag scan (MainNELApp.java:233-241): there, mentions
arrive pre-annotated as TEI child elements; on raw transcript text we detect them by
scanning for known surface forms (dictionary aliases + annotatable NIL terms).

Matching rule (deterministic, shared by the Spark pandas UDF, the single-node oracle
and the fixture generator):
  * case-sensitive whole-word match (word chars = letters/digits/underscore, so
    accented French letters count as word chars);
  * left-to-right, longest match wins at each position, matches never overlap.

The compiled matcher is a single alternation regex with longest-alternative-first
ordering, which for whole-word alternatives implements leftmost-longest matching.
"""

from __future__ import annotations

import re
from collections.abc import Iterable


def _trie_pattern(terms: list[str]) -> str:
    """Serialize terms into a trie-structured regex.

    Equivalent to a longest-first alternation (greedy optional suffixes extend
    first, backtracking falls back to shorter terms) but O(prefix) instead of
    O(#terms) work per scan position — the difference between ~5k and ~50k
    turns/sec on a few-hundred-term gazetteer.
    """
    trie: dict = {}
    for t in terms:
        node = trie
        for ch in t:
            node = node.setdefault(ch, {})
        node[""] = {}

    def serialize(node: dict) -> str:
        keys = sorted(k for k in node if k != "")
        has_end = "" in node
        alts = []
        for ch in keys:
            sub = serialize(node[ch])
            alts.append(re.escape(ch) + sub)
        if not alts:
            return ""
        body = alts[0] if len(alts) == 1 else "(?:" + "|".join(alts) + ")"
        return "(?:" + body + ")?" if has_end else body

    return serialize(trie)


class GazetteerMatcher:
    """Compiled multi-term matcher; picklable-cheap (rebuilt per executor)."""

    def __init__(self, terms: Iterable[str]):
        uniq = sorted({t for t in terms if t}, key=lambda t: (-len(t), t))
        self.terms = uniq
        if uniq:
            # \w covers accented letters with re.UNICODE (default in py3).
            self._re = re.compile(rf"(?<!\w)({_trie_pattern(uniq)})(?!\w)")
        else:
            self._re = None

    def find(self, text: str) -> list[tuple[str, int]]:
        """Return [(term, start_pos)] in left-to-right order, non-overlapping."""
        if not text or self._re is None:
            return []
        return [(m.group(1), m.start(1)) for m in self._re.finditer(text)]


def find_mentions(text: str, matcher: GazetteerMatcher) -> list[tuple[str, int]]:
    return matcher.find(text)
