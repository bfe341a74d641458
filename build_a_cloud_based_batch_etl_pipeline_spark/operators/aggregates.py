"""aggregates operators (filled in incrementally)."""
