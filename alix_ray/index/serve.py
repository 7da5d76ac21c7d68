"""Distributed query serving: an actor pool over the immutable index.

Reference analog: the servlet container's request threads over one
frozen ``LuceneIndex`` handle (SURVEY.md §3.2, §4 "query actors each
own the (immutable) index artifacts; scale by actor count").  Each
actor loads the artifacts once in ``__init__``; the pool round-robins
queries; throughput scales with ``n_actors`` since the index is
read-only and per-actor caches warm independently.

At 10^12-doc scale each actor would mmap / row-group-prune its postings
instead of loading them (BM25Index docstring); the pool shape is
unchanged.
"""

from __future__ import annotations

import ray


@ray.remote
class QueryActor:
    """One serving replica holding the frozen index."""

    def __init__(self, index_dir: str, warm_top_n: int = 512):
        from .engine import BM25Index

        self.ix = BM25Index(index_dir)
        if warm_top_n:
            # preload the Zipf head so a fresh replica doesn't pay
            # cold row-group reads on its first hot-term queries
            self.ix.warm(warm_top_n)

    def search(self, query: str, k: int = 10):
        return self.ix.search(query, k)

    def search_terms(self, terms: list[str], k: int = 10):
        return self.ix.search_terms(terms, k)

    def search_span(self, terms: list[str], k: int = 10, slop: int = 0):
        return self.ix.search_span(terms, k, slop=slop)

    def suggest_prefix(self, prefix: str, k: int = 10):
        from ..ops.analytics import suggest

        # folded vocab frame cached on the handle — no per-request
        # O(vocab) materialization
        out = suggest(self.ix.suggest_frame(), prefix, k)
        return list(zip(out["term"], out["cf"]))

    def refresh(self, warm_top_n: int = 512) -> bool:
        """Swap to the latest index state if a writer advanced it
        (``DirectoryReader.openIfChanged``): unchanged state keeps
        every warm cache; a changed state reopens + re-warms.  Returns
        True when a new snapshot was adopted."""
        new = self.ix.reopen_if_changed()
        if new is self.ix:
            return False
        if warm_top_n:
            new.warm(warm_top_n)
        self.ix = new
        return True


class QueryService:
    """Round-robin facade over an actor pool; fire-and-gather batching."""

    def __init__(self, index_dir: str, n_actors: int = 2):
        self.actors = [
            QueryActor.remote(index_dir) for _ in range(n_actors)
        ]
        self._rr = 0

    def _next(self):
        a = self.actors[self._rr % len(self.actors)]
        self._rr += 1
        return a

    def search(self, query: str, k: int = 10):
        return ray.get(self._next().search.remote(query, k))

    def search_many(self, term_lists: list[list[str]], k: int = 10):
        """Pipeline a batch of queries across the pool (throughput path)."""
        futs = [
            self._next().search_terms.remote(terms, k) for terms in term_lists
        ]
        return ray.get(futs)

    def shutdown(self):
        for a in self.actors:
            ray.kill(a)
        self.actors = []
