"""dedup operators (filled in incrementally)."""
