"""Batch job entry points (SURVEY.md §2 op K4)."""
