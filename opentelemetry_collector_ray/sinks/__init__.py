"""Sinks (exporter analogs, SURVEY.md §2.8): partitioned Parquet writes
replace the OTLP wire exporters; reliability helpers (retry/queue/WAL)
map to Ray task retries + the manifest store in ``state``."""
