"""Training-data pipeline operators (BASELINE north-star): deduplication,
similarity search, text analysis, multimodal column plumbing."""
