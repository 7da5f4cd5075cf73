"""LLM-training-data pipeline operators (north-star mandate): dedup,
similarity search, text analysis, multimodal column plumbing."""
