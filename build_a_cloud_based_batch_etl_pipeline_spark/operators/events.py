"""events operators (filled in incrementally)."""
