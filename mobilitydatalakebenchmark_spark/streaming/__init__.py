"""Structured Streaming parity layer (SURVEY.md §2.6 W5, §2.1 S2)."""
