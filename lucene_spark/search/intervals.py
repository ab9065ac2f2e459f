"""Minimal-interval algebra over per-doc position arrays — the
queries/intervals module analog (IntervalQuery.java:59, Intervals.java).

An interval source maps a document's {term -> sorted positions} dict to a
list of (start, end) intervals. Semantics follow the reference's
minimal-interval model (after Clarke/Cormack/Vigna): the result set keeps
only intervals that do not contain another result interval.

Leaf:      term       -> [(p, p)] per occurrence
Composite: ordered    -> minimal intervals with one match of each source
                         in source order
           unordered  -> minimal windows with one match of each source in
                         any order
Filters:   max_gaps   -> keep intervals with (end-start) - (k-1) <= g
           max_width  -> keep intervals with end - start <= w

Scoring: freq(doc) = sum over result intervals of 1 / (1 + gaps), fed to
BM25 with the summed idf of all leaf terms (same shape as sloppy-phrase
weighting, PhraseScorer.java:75-81).

Pure-Python/numpy per document: arrays are tiny after the docID
conjunction, exactly like the two-phase phrase matcher.
"""

from __future__ import annotations

import numpy as np

from lucene_spark.search import plans as P


def _children(src) -> list:
    if isinstance(src, (P.IntervalOrdered, P.IntervalUnordered, P.IntervalOr)):
        return list(src.sources)
    if isinstance(src, P.IntervalContaining):
        return [src.big, src.small]
    if isinstance(src, P.IntervalContainedBy):
        return [src.small, src.big]
    if isinstance(src, P.IntervalNotContaining):
        return [src.minuend, src.subtrahend]
    if isinstance(src, P.IntervalNotContainedBy):
        return [src.small, src.big]
    if isinstance(src, P.IntervalNotWithin):
        return [src.minuend, src.subtrahend]
    if isinstance(src, (P.IntervalFirst, P.IntervalPositionRange)):
        return [src.source]
    if isinstance(src, P.IntervalNotOverlapping):
        return [src.minuend, src.subtrahend]
    raise TypeError(f"not an interval source: {src!r}")


def leaf_terms(src) -> list[str]:
    """ALL terms under the source (stats/weights + position fetch)."""
    if isinstance(src, P.IntervalTerm):
        return [src.term]
    out: list[str] = []
    for s in _children(src):
        out.extend(leaf_terms(s))
    return out


def leaf_key(src) -> object:
    """Position-dict key for one leaf: the bare term for default-field
    leaves (the common case, and the key shape every existing caller
    uses), else (field, term) — FieldMaskingSpanQ trees mix fields."""
    return (src.field, src.term) if src.field else src.term


def leaf_keys(src) -> list:
    """ALL leaf keys under the source (see leaf_key)."""
    if isinstance(src, P.IntervalTerm):
        return [leaf_key(src)]
    out: list = []
    for s in _children(src):
        out.extend(leaf_keys(s))
    return out


def has_field_leaves(src) -> bool:
    """True if any leaf is scoped to a non-default field."""
    if isinstance(src, P.IntervalTerm):
        return src.field is not None
    return any(has_field_leaves(s) for s in _children(src))


def required_terms(src) -> list[list]:
    """Conjunction slots for the phase-1 docID approximation: a doc can
    match only if, for every slot, at least ONE of the slot's terms is
    present. `or` contributes one slot with all alternatives; negative
    combinators (notContaining / notContainedBy / notWithin) contribute
    only their positive side — the subtrahend is optional
    (FilteringIntervalsSource semantics). Slot entries are leaf KEYS
    (bare term, or (field, term) for field-scoped leaves)."""
    if isinstance(src, P.IntervalTerm):
        return [[leaf_key(src)]]
    if isinstance(src, (P.IntervalOrdered, P.IntervalUnordered)):
        out: list[list] = []
        for s in src.sources:
            out.extend(required_terms(s))
        return out
    if isinstance(src, P.IntervalOr):
        # one slot: union of every alternative's terms
        alts: list = []
        for s in src.sources:
            alts.extend(leaf_keys(s))
        return [alts]
    if isinstance(src, P.IntervalContaining):
        return required_terms(src.big) + required_terms(src.small)
    if isinstance(src, P.IntervalContainedBy):
        return required_terms(src.small) + required_terms(src.big)
    if isinstance(src, P.IntervalNotContaining):
        return required_terms(src.minuend)
    if isinstance(src, P.IntervalNotContainedBy):
        return required_terms(src.small)
    if isinstance(src, P.IntervalNotWithin):
        return required_terms(src.minuend)
    if isinstance(src, (P.IntervalFirst, P.IntervalPositionRange)):
        return required_terms(src.source)
    if isinstance(src, P.IntervalNotOverlapping):
        return required_terms(src.minuend)
    raise TypeError(f"not an interval source: {src!r}")


def _minimalize(intervals: list[tuple[int, int]]) -> list[tuple[int, int]]:
    """Drop intervals that properly contain another result interval."""
    out = []
    for a in intervals:
        if not any(
            b != a and a[0] <= b[0] and b[1] <= a[1] for b in intervals
        ):
            out.append(a)
    return sorted(set(out))


def evaluate(src, pos_by_term: dict) -> list[tuple[int, int]]:
    """Interval source -> minimal (start, end) list for one document."""
    if isinstance(src, P.IntervalTerm):
        pos = pos_by_term.get(leaf_key(src))
        if pos is None or len(pos) == 0:
            return []
        return [(int(p), int(p)) for p in pos]
    if isinstance(src, P.IntervalOr):
        merged: list[tuple[int, int]] = []
        for s in src.sources:
            merged.extend(evaluate(s, pos_by_term))
        return _minimalize(merged)
    if isinstance(src, P.IntervalContaining):
        big = evaluate(src.big, pos_by_term)
        small = evaluate(src.small, pos_by_term)
        return [
            b for b in big
            if any(b[0] <= s0 and s1 <= b[1] for s0, s1 in small)
        ]
    if isinstance(src, P.IntervalContainedBy):
        small = evaluate(src.small, pos_by_term)
        big = evaluate(src.big, pos_by_term)
        return [
            s for s in small
            if any(b0 <= s[0] and s[1] <= b1 for b0, b1 in big)
        ]
    if isinstance(src, P.IntervalNotContaining):
        minuend = evaluate(src.minuend, pos_by_term)
        sub = evaluate(src.subtrahend, pos_by_term)
        return [
            m for m in minuend
            if not any(m[0] <= s0 and s1 <= m[1] for s0, s1 in sub)
        ]
    if isinstance(src, P.IntervalNotContainedBy):
        small = evaluate(src.small, pos_by_term)
        big = evaluate(src.big, pos_by_term)
        return [
            s for s in small
            if not any(b0 <= s[0] and s[1] <= b1 for b0, b1 in big)
        ]
    if isinstance(src, P.IntervalNotWithin):
        minuend = evaluate(src.minuend, pos_by_term)
        sub = evaluate(src.subtrahend, pos_by_term)
        n = src.positions
        return [
            m for m in minuend
            if not any(m[0] <= s1 + n and s0 - n <= m[1] for s0, s1 in sub)
        ]
    if isinstance(src, P.IntervalFirst):
        # SpanFirstQuery: span.end() <= end with exclusive span ends,
        # i.e. inclusive interval end < end
        return [
            iv for iv in evaluate(src.source, pos_by_term) if iv[1] < src.end
        ]
    if isinstance(src, P.IntervalPositionRange):
        # SpanPositionRangeQuery.java:44: start >= range start AND
        # end <= range end (same exclusive-end convention as above)
        return [
            iv for iv in evaluate(src.source, pos_by_term)
            if iv[0] >= src.start and iv[1] < src.end
        ]
    if isinstance(src, P.IntervalNotOverlapping):
        minuend = evaluate(src.minuend, pos_by_term)
        sub = evaluate(src.subtrahend, pos_by_term)
        pre, post = src.pre, src.post
        # exclusion zone per subtrahend interval: [s0 - pre, s1 + post];
        # overlap <=> m0 <= zone_end and zone_start <= m1
        return [
            m for m in minuend
            if not any(
                m[0] <= s1 + post and s0 - pre <= m[1] for s0, s1 in sub
            )
        ]
    if isinstance(src, P.IntervalOrdered):
        subs = [evaluate(s, pos_by_term) for s in src.sources]
        if any(not s for s in subs):
            return []
        # chain greedily: for each interval of source 0, find the nearest
        # following interval of source 1 (start > end of previous), etc.
        cands = []
        for first in subs[0]:
            start, prev_end = first[0], first[1]
            ok = True
            for nxt in subs[1:]:
                best = None
                for iv in nxt:  # nxt sorted by (start, end)
                    if iv[0] > prev_end:
                        best = iv
                        break
                if best is None:
                    ok = False
                    break
                prev_end = best[1]
            if ok:
                cands.append((start, prev_end))
        return _filter(src, len(src.sources), _minimalize(cands))
    if isinstance(src, P.IntervalUnordered):
        subs = [evaluate(s, pos_by_term) for s in src.sources]
        if any(not s for s in subs):
            return []
        k = len(subs)
        idx = [0] * k
        cands = []
        while True:
            starts = [subs[i][idx[i]][0] for i in range(k)]
            ends = [subs[i][idx[i]][1] for i in range(k)]
            cands.append((min(starts), max(ends)))
            j = int(np.argmin(starts))
            idx[j] += 1
            if idx[j] >= len(subs[j]):
                break
        return _filter(src, k, _minimalize(cands))
    raise TypeError(f"not an interval source: {src!r}")


def _filter(src, k: int, intervals: list[tuple[int, int]]) -> list[tuple[int, int]]:
    out = intervals
    if src.max_width >= 0:
        out = [iv for iv in out if iv[1] - iv[0] <= src.max_width]
    if src.max_gaps >= 0:
        out = [iv for iv in out if (iv[1] - iv[0]) - (k - 1) <= src.max_gaps]
    return out


def _gap_k(src) -> int:
    """Leaf count used for the per-interval gaps approximation. For the
    negative/filter combinators the RESULT intervals come from the
    positive side only, so gaps are judged against its leaf count."""
    if isinstance(src, P.IntervalContaining):
        return _gap_k(src.big)
    if isinstance(src, (P.IntervalContainedBy, P.IntervalNotContainedBy)):
        return _gap_k(src.small)
    if isinstance(src, (P.IntervalNotContaining, P.IntervalNotWithin,
                        P.IntervalNotOverlapping)):
        return _gap_k(src.minuend)
    if isinstance(src, (P.IntervalFirst, P.IntervalPositionRange)):
        return _gap_k(src.source)
    if isinstance(src, P.IntervalOr):
        # result intervals each come from one alternative; use the
        # smallest alternative's k (width-0 leaves dominate in practice)
        return min(_gap_k(s) for s in src.sources)
    return max(1, len(leaf_terms(src)))


def freq_of(src, pos_by_term: dict, n_leaves: int | None = None) -> float:
    """Scoring freq: sum of 1/(1+gaps) over result intervals."""
    ivs = evaluate(src, pos_by_term)
    if not ivs:
        return 0.0
    k = _gap_k(src)
    return float(sum(1.0 / (1.0 + max(0, (e - s) - (k - 1))) for s, e in ivs))
