"""Composed pipelines (graph analog: service/internal/graph builds consumer
chains; here Datasets compose directly, SURVEY.md §3.1)."""
