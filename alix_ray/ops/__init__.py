"""Analytics operators + large-scale training-data operations.

Reference-parity analytics (SURVEY.md §2.5-§2.9): keyness scorers,
facet/category counts, year histograms, term suggestion, windowed
co-occurrence.  Plus the training-data-pipeline extensions the
reference lacks (SURVEY.md §2.8 notes it has no dedup): exact and
near-dup deduplication, similarity search, text statistics, multimodal
plumbing.
"""
