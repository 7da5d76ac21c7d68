"""Query-side index artifacts and BM25 top-k engines."""
