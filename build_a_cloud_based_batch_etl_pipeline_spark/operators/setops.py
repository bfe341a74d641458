"""setops operators (filled in incrementally)."""
