"""Composite operators: batch time windows, dedup, similarity search,
text analysis, multimodal plumbing."""
