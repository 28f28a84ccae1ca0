"""Checkpoint / lineage state (persistent-queue analog, SURVEY.md §2.8)."""
