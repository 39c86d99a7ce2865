"""Training-data pipeline operators: dedup families, similarity
search, text QC, multimodal plumbing."""
