"""Query-side parsing."""
