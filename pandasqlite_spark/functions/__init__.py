"""LLM-data-pipeline extensions: dedup, similarity, text, multimodal."""
