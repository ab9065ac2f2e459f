"""Filter caching — the LRUQueryCache + UsageTrackingQueryCachingPolicy
analog (search/LRUQueryCache.java:85, UsageTrackingQueryCachingPolicy
.java:110-140).

The reference caches per-segment bitsets of filters once a query has
been *seen* often enough (2 uses for costly-to-build iterators like
multi-term/point queries, 5 for cheap ones), bounded by an LRU. The
Spark analog caches the materialized doc-set DataFrame: ``persist()``
pins the computed docID set in executor block storage, so a hot filter
("lang = en", "term in dictionary slice") is computed once per cluster
instead of once per query. Eviction unpersists.

Keys are the (frozen, hashable) plan nodes themselves — structural
equality, like the reference keying on Query equals/hashCode.
"""

from __future__ import annotations

from collections import Counter, OrderedDict, deque

from lucene_spark.search import plans as P

# iterator construction scans the whole dictionary/index for these —
# the reference caches them after only 2 sightings (isCostly)
_COSTLY = (
    P.PrefixQ, P.WildcardQ, P.RegexpQ, P.FuzzyQ, P.TermRangeQ, P.TermInSetQ,
)


class LRUQueryCache:
    def __init__(self, max_size: int = 32, history_size: int = 256):
        self.max_size = max_size
        self._cached: OrderedDict = OrderedDict()  # plan node -> persisted DF
        self._history: deque = deque(maxlen=history_size)
        self._freq: Counter = Counter()
        self.hits = 0
        self.misses = 0

    def _min_frequency(self, q) -> int:
        # UsageTrackingQueryCachingPolicy.minFrequencyToCache
        if isinstance(q, _COSTLY):
            return 2
        if isinstance(q, (P.BoolQ, P.DisMaxQ)):
            return 4  # compound queries cache a bit earlier (see ref comment)
        return 5

    def _record(self, q) -> None:
        if len(self._history) == self._history.maxlen:
            self._freq[self._history[0]] -= 1
        self._history.append(q)
        self._freq[q] += 1

    def get_or_compute(self, q, compute):
        """Return the doc-set DataFrame for plan node ``q``, serving the
        persisted copy when cached and persisting once the sighting
        frequency clears the policy threshold."""
        try:
            hash(q)
        except TypeError:
            return compute()  # unhashable node: never cached
        if q in self._cached:
            self._cached.move_to_end(q)
            self.hits += 1
            return self._cached[q]
        self.misses += 1
        self._record(q)
        df = compute()
        if self._freq[q] >= self._min_frequency(q):
            df = df.persist()
            self._cached[q] = df
            if len(self._cached) > self.max_size:
                _, evicted = self._cached.popitem(last=False)
                evicted.unpersist()
        return df

    def clear(self) -> None:
        for df in self._cached.values():
            df.unpersist()
        self._cached.clear()
        self._freq.clear()
        self._history.clear()
