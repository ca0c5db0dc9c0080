"""Operator library — each module is one family from SURVEY.md §2."""
