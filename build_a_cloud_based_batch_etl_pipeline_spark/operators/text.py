"""text operators (filled in incrementally)."""
