"""multimodal operators (filled in incrementally)."""
