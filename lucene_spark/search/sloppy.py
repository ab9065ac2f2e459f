"""Sloppy-phrase matching — the SloppyPhraseMatcher algorithm
(search/SloppyPhraseMatcher.java:163-205 nextMatch, :365-470 repeat
init), re-expressed over per-doc position arrays.

Semantics reproduced exactly:
- Every phrase slot is a PhrasePositions (PP) with `offset` = its query
  position; a PP's `position` is docPosition - offset so an exact match
  aligns all PPs at one value.
- The PriorityQueue orders PPs by (position, offset, ord)
  (search/PhraseQueue.java:24-38).
- nextMatch pops the least PP, records matchLength = end - pp.position,
  advances the popped PP until it passes the next-least PP (shrinking
  matchLength to the minimum seen), then emits a match iff
  matchLength <= slop; freq accumulates 1/(1 + matchLength) per match
  (PhraseScorer.java:75-81 sloppyWeight).
- Repeats (a term occupying several slots): repeat groups are collision
  -resolved so no two PPs of a group sit on the same token position —
  at init the j-th group member (by query offset) advances j times
  (SloppyPhraseMatcher.advanceRepeatGroups), and after every advance a
  collision advances the lesser PP (advanceRpts). This is the behavior
  the anchor-greedy approximation got wrong for phrases like
  "get get value".

The matcher's documented asymmetries are reproduced too (the class
comment's "a b c b a" example): only the least PP propagates, so not
every combination is enumerated — this is the REFERENCE's scoring, not
an idealized one.
"""

from __future__ import annotations

import heapq


class _PP:
    __slots__ = ("positions", "idx", "offset", "ord", "position", "rpt_group", "rpt_ind")

    def __init__(self, positions, offset: int, ord_: int):
        self.positions = positions  # sorted token positions for the slot's term
        self.idx = 0
        self.offset = offset
        self.ord = ord_
        self.position = 0
        self.rpt_group = -1
        self.rpt_ind = 0

    def first_position(self) -> None:
        self.idx = 0
        self.position = int(self.positions[0]) - self.offset

    def next_position(self) -> bool:
        self.idx += 1
        if self.idx < len(self.positions):
            self.position = int(self.positions[self.idx]) - self.offset
            return True
        return False

    def key(self):
        return (self.position, self.offset, self.ord)

    def tp_pos(self) -> int:
        return self.position + self.offset


def sloppy_phrase_freq(slot_positions: list, slop: int) -> float:
    """freq = Σ 1/(1+matchLength) over the reference's match enumeration.

    `slot_positions`: one entry per phrase slot, in query order:
    (term_key, sorted_token_positions). ``term_key`` is a single
    hashable for plain phrases, or a frozenset of term ids for
    MultiPhraseQuery alternative slots (positions = sorted union of the
    alternatives, like the reference's UnionPostingsEnum). Repeat groups
    follow the reference: terms appearing in >=2 slots are repeating;
    without multi-term slots a group is the slots of one repeating term;
    with multi-term slots, groups are connected components over the
    slot/term bipartite graph (gatherRptGroups' unionTermGroups).
    Returns 0.0 when the doc has no slop-valid match. Caller guarantees
    every slot has at least one position (the conjunction approximation
    already passed)."""
    pps = [
        _PP(positions, i, i) for i, (_tk, positions) in enumerate(slot_positions)
    ]
    keys = [
        tk if isinstance(tk, frozenset) else frozenset([tk])
        for tk, _pos in slot_positions
    ]
    # repeating terms: present in >= 2 slots (repeatingTerms())
    term_count: dict = {}
    for ks in keys:
        for t in ks:
            term_count[t] = term_count.get(t, 0) + 1
    rpt_terms = {t for t, c in term_count.items() if c >= 2}
    has_multi_term_rpts = any(
        len(ks) > 1 and (ks & rpt_terms) for ks in keys
    )
    # connected components of repeating terms (unionTermGroups): terms
    # co-occurring in one slot's alternative set share a group
    parent = {t: t for t in rpt_terms}

    def find(t):
        while parent[t] != t:
            parent[t] = parent[parent[t]]
            t = parent[t]
        return t

    for ks in keys:
        rs = [t for t in ks if t in rpt_terms]
        for a, b in zip(rs, rs[1:]):
            parent[find(a)] = find(b)
    groups_by_root: dict = {}
    for pp, ks in zip(pps, keys):
        roots = {find(t) for t in ks if t in rpt_terms}
        for r in roots:
            groups_by_root.setdefault(r, [])
            if pp not in groups_by_root[r]:
                groups_by_root[r].append(pp)
    rpt_groups = []
    for members in groups_by_root.values():
        if len(members) > 1:
            members.sort(key=lambda p: p.offset)
            for j, pp in enumerate(members):
                pp.rpt_group = len(rpt_groups)
                pp.rpt_ind = j
            rpt_groups.append(members)
    has_rpts = bool(rpt_groups)

    state = {"end": -(1 << 60)}

    def advance_pp(pp: _PP) -> bool:
        if not pp.next_position():
            return False
        if pp.position > state["end"]:
            state["end"] = pp.position
        return True

    def collide(pp: _PP):
        tp = pp.tp_pos()
        for pp2 in rpt_groups[pp.rpt_group]:
            if pp2 is not pp and pp2.tp_pos() == tp:
                return pp2
        return None

    def lesser(a: _PP, b: _PP) -> _PP:
        if a.position < b.position or (
            a.position == b.position and a.offset < b.offset
        ):
            return a
        return b

    # ---- init (initPhrasePositions / initComplex) ----
    for pp in pps:
        pp.first_position()
    if has_rpts:
        # advanceRepeatGroups
        for rg in rpt_groups:
            if has_multi_term_rpts:
                # multi-term branch: some members may not collide at all
                # ("hidden collisions" resolved by collide-driven
                # advances; SloppyPhraseMatcher.advanceRepeatGroups)
                i = 0
                while i < len(rg):
                    incr = 1
                    pp = rg[i]
                    while True:
                        other = collide(pp)
                        if other is None:
                            break
                        pp2 = lesser(pp, other)
                        if not pp2.next_position():
                            return 0.0
                        if pp2.rpt_ind < i:
                            incr = 0
                            break
                    i += incr
            else:
                # single-term repeats: j-th member advances j times
                for j in range(1, len(rg)):
                    for _ in range(j):
                        if not rg[j].next_position():
                            return 0.0
    state["end"] = max(pp.position for pp in pps)

    heap = [(pp.key(), pp) for pp in pps]
    heapq.heapify(heap)

    def heap_push(pp: _PP) -> None:
        heapq.heappush(heap, (pp.key(), pp))

    def heap_pop() -> _PP:
        return heapq.heappop(heap)[1]

    def advance_rpts(pp: _PP) -> bool:
        """Collision resolution after advancing pp
        (SloppyPhraseMatcher.advanceRpts): advance the lesser of the two
        colliding PPs until no collision; re-heapify affected entries."""
        if pp.rpt_group < 0:
            return True
        moved = False
        cur = pp
        while True:
            other = collide(cur)
            if other is None:
                break
            cur = lesser(cur, other)
            if not advance_pp(cur):
                return False
            if cur is not pp:
                moved = True
        if moved:
            # some queued PPs changed position: rebuild the heap with
            # current keys (the reference re-queues just the marked ones;
            # a rebuild is equivalent)
            entries = [e[1] for e in heap]
            heap.clear()
            for e in entries:
                heap.append((e.key(), e))
            heapq.heapify(heap)
        return True

    # ---- nextMatch loop, inlined with PhraseScorer's freq accumulation
    # (each emitted match re-enters with a fresh pop, exactly like
    # PhraseScorer's `while (matcher.nextMatch()) freq += sloppyWeight`)
    freq = 0.0
    pp = heap_pop()
    match_length = state["end"] - pp.position
    next_pos = heap[0][0][0]
    while True:
        if not advance_pp(pp):
            break
        if has_rpts and not advance_rpts(pp):
            break
        if pp.position > next_pos:
            heap_push(pp)
            if match_length <= slop:
                freq += 1.0 / (1.0 + match_length)
            pp = heap_pop()
            next_pos = heap[0][0][0]
            match_length = state["end"] - pp.position
        else:
            ml2 = state["end"] - pp.position
            if ml2 < match_length:
                match_length = ml2
    if match_length <= slop:
        freq += 1.0 / (1.0 + match_length)
    return freq
