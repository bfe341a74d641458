"""Operator implementations, grouped by family (SURVEY.md §2.2).

Each module registers named queries via queries.query(); pure helper
operators (reusable DataFrame->DataFrame transforms) live alongside them.
"""
