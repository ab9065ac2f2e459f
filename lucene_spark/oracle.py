"""Single-node naive BM25 oracle — the golden "simple implementation".

The reference validates its optimized scorers against deliberately naive
ones (core tests TestBoolean2.java, CheckHits); this module plays that
role for the Spark engine: a direct dict-of-lists inverted index with the
exact float32 arithmetic of bm25.py. Tests assert the Spark engine's
(doc_id, score) results equal this oracle's bit-for-bit.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from lucene_spark import bm25
from lucene_spark.analysis import tokenize
from lucene_spark.smallfloat import int_to_byte4


class PandasOracle:
    def __init__(self, docs: pd.DataFrame, text_col: str = "text", id_col: str = "doc_id"):
        self.postings: dict[str, dict[int, list[int]]] = {}
        self.norms: dict[int, int] = {}
        self.dls: dict[int, int] = {}
        n_with_field = 0
        sum_ttf = 0
        for _, row in docs.iterrows():
            doc_id = int(row[id_col])
            terms, positions = tokenize(row[text_col])
            self.dls[doc_id] = len(terms)
            self.norms[doc_id] = int(int_to_byte4([len(terms)])[0])
            if terms:
                n_with_field += 1
                sum_ttf += len(terms)
            for t, p in zip(terms, positions):
                self.postings.setdefault(t, {}).setdefault(doc_id, []).append(p)
        self.N = len(docs)
        self.doc_count = n_with_field
        self.sum_ttf = sum_ttf
        self.avgdl = bm25.avg_field_length(sum_ttf, n_with_field)
        self.cache = bm25.norm_cache(self.avgdl)

    # --- scoring primitives ---

    def _weight(self, df: int, boost: float = 1.0) -> np.float32:
        return np.float32(boost) * bm25.idf(df, self.doc_count)

    def term_scores(self, term: str, boost: float = 1.0) -> dict[int, np.float32]:
        plist = self.postings.get(term, {})
        if not plist:
            return {}
        w = self._weight(len(plist), boost)
        out = {}
        for doc_id, positions in plist.items():
            s = bm25.score(
                np.array([len(positions)]), np.array([self.norms[doc_id]]), w, self.cache
            )
            out[doc_id] = s[0]
        return out

    def phrase_scores(self, terms: list[str], boost: float = 1.0) -> dict[int, np.float32]:
        plists = [self.postings.get(t, {}) for t in terms]
        if any(not p for p in plists):
            return {}
        w = np.float32(boost) * bm25.combined_idf(
            [len(p) for p in plists], self.doc_count
        )
        docs = set(plists[0])
        for p in plists[1:]:
            docs &= set(p)
        out = {}
        for d in docs:
            cand = np.asarray(plists[0][d], dtype=np.int64)
            for i in range(1, len(terms)):
                cand = np.intersect1d(cand, np.asarray(plists[i][d], dtype=np.int64) - i)
            freq = int((cand >= 0).sum())
            if freq:
                s = bm25.score(np.array([freq]), np.array([self.norms[d]]), w, self.cache)
                out[d] = s[0]
        return out

    def multiphrase_scores(
        self, slots: list[tuple], slop: int = 0, boost: float = 1.0
    ) -> dict[int, np.float32]:
        """Phrase over alternative-term slots, exact (slop=0) or sloppy —
        mirrors the engine's semantics (executor._phrase_scored): for
        single-term slots the reference SloppyPhraseMatcher algorithm
        (sloppy.py); for alternative slots the documented anchor-greedy
        approximation."""
        all_terms = [t for alt in slots for t in alt if t in self.postings]
        live_slots = [
            [t for t in alt if t in self.postings] for alt in slots
        ]
        if any(not alt for alt in live_slots):
            return {}
        w = np.float32(boost) * bm25.combined_idf(
            [len(self.postings[t]) for t in all_terms], self.doc_count
        )
        # candidate docs: present in some term of every slot
        doc_sets = [
            set().union(*(self.postings[t].keys() for t in alt)) for alt in live_slots
        ]
        docs = set.intersection(*doc_sets)
        single_term = all(len(alt) == 1 for alt in live_slots)
        out = {}
        for d in docs:
            if slop > 0 and single_term:
                from lucene_spark.search.sloppy import sloppy_phrase_freq

                if any(d not in self.postings[alt[0]] for alt in live_slots):
                    continue
                freq = sloppy_phrase_freq(
                    [(alt[0], self.postings[alt[0]][d]) for alt in live_slots], slop
                )
                if freq:
                    s = bm25.score(
                        np.array([freq]), np.array([self.norms[d]]), w, self.cache
                    )
                    out[d] = s[0]
                continue
            slot_pos = []
            for off, alt in enumerate(live_slots):
                parts = [
                    np.asarray(self.postings[t][d], dtype=np.int64) - off
                    for t in alt
                    if d in self.postings[t]
                ]
                if not parts:
                    slot_pos = None
                    break
                slot_pos.append(np.unique(np.concatenate(parts)))
            if slot_pos is None:
                continue
            if slop == 0:
                cand = slot_pos[0]
                for sp in slot_pos[1:]:
                    cand = np.intersect1d(cand, sp, assume_unique=True)
                freq = float(len(cand[cand >= 0]))
            else:
                freq = 0.0
                for a in slot_pos[0]:
                    picks = [int(a)]
                    ok = True
                    for sp in slot_pos[1:]:
                        d_best = None
                        j = int(np.searchsorted(sp, a))
                        for jj in (j - 1, j):
                            if 0 <= jj < len(sp):
                                dd = abs(int(sp[jj]) - int(a))
                                if d_best is None or dd < d_best[0]:
                                    d_best = (dd, int(sp[jj]))
                        if d_best is None:
                            ok = False
                            break
                        picks.append(d_best[1])
                    if not ok:
                        continue
                    ml = max(picks) - min(picks)
                    if ml <= slop:
                        freq += 1.0 / (1.0 + ml)
            if freq:
                s = bm25.score(
                    np.array([freq]), np.array([self.norms[d]]), w, self.cache
                )
                out[d] = s[0]
        return out

    def or_scores(self, clause_scores: list[dict]) -> dict[int, np.float32]:
        """Double accumulate, cast float (DisjunctionSumScorer.java:38-44)."""
        acc: dict[int, float] = {}
        for cs in clause_scores:
            for d, s in cs.items():
                acc[d] = acc.get(d, 0.0) + float(s)
        return {d: np.float32(v) for d, v in acc.items()}

    def and_scores(self, clause_scores: list[dict]) -> dict[int, np.float32]:
        docs = set(clause_scores[0])
        for cs in clause_scores[1:]:
            docs &= set(cs)
        out = {}
        for d in docs:
            out[d] = np.float32(sum(float(cs[d]) for cs in clause_scores))
        return out

    @staticmethod
    def top_k(scores: dict[int, np.float32], k: int) -> list[tuple[int, float]]:
        """(score desc, docID asc) — HitQueue.java:78-84 tie-break."""
        items = sorted(scores.items(), key=lambda kv: (-float(kv[1]), kv[0]))
        return [(d, float(s)) for d, s in items[:k]]
