"""Large-scale training-data operators: dedup families, similarity search,
text analysis, multimodal plumbing."""
