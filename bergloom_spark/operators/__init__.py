"""Relational + pipeline operators (SURVEY.md §2 inventory)."""
