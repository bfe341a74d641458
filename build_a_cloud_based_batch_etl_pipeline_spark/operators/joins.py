"""joins operators (filled in incrementally)."""
