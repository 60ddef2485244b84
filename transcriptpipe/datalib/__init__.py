"""datalib — large-scale training-data pipeline operations.

Beyond the reference's own operator surface: deduplication, similarity
search, text analysis, and multimodal column handling, each designed for the
100 TB regime (documented per module) and exercised over the driver's
``documents`` / ``embeddings`` tables.
"""
