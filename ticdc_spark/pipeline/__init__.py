"""Training-data pipeline operators: dedup, similarity search, text
analysis, multimodal plumbing. First-class components alongside the CDC
engine — the operations a 100 TB pre-training data pipeline runs over the
tables this engine maintains.
"""
