"""windows operators (filled in incrementally)."""
