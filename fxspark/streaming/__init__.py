"""Structured Streaming mode (SURVEY.md §7 step 6)."""
