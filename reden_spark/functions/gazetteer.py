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


class GazetteerMatcher:
    """Compiled multi-term matcher; picklable-cheap (rebuilt per executor)."""

    def __init__(self, terms: Iterable[str]):
        uniq = sorted({t for t in terms if t}, key=lambda t: (-len(t), t))
        self.terms = uniq
        if uniq:
            alt = "|".join(re.escape(t) for t in uniq)
            # \b works for accented letters with re.UNICODE (default in py3).
            self._re = re.compile(rf"(?<!\w)({alt})(?!\w)")
        else:
            self._re = None

    def find(self, text: str) -> list[tuple[str, int]]:
        """Return [(term, start_pos)] in left-to-right order, non-overlapping."""
        if not text or self._re is None:
            return []
        return [(m.group(1), m.start(1)) for m in self._re.finditer(text)]


def find_mentions(text: str, matcher: GazetteerMatcher) -> list[tuple[str, int]]:
    return matcher.find(text)
