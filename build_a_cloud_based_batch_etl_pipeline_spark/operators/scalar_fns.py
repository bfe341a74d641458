"""scalar_fns operators (filled in incrementally)."""
