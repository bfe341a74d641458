"""similarity operators (filled in incrementally)."""
