"""Placeholder — filled in as SURVEY.md §2 coverage widens."""

QUERIES: dict = {}
