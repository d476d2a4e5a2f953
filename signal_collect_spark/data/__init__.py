"""Training-data pipeline operators (dedup, similarity search, text
analysis, multimodal plumbing) — first-class components for running
this engine over 100 TB document/embedding corpora."""
