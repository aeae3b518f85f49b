"""Scale-pipeline function library: dedup sketches, similarity search,
text analysis, multimodal column plumbing."""
