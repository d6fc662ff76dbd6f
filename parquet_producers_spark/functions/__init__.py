"""Training-data pipeline operators: text analysis, dedup, similarity
search, multimodal plumbing (task mandate beyond the reference's own
operator set)."""
