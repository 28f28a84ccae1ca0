"""Vectorized scalar-function library (the pcommon.Map / OTTL / filter.Filter
analog surface, SURVEY.md §2.9)."""
