"""Sources (receiver analogs, SURVEY.md §2.1): batch reads replace the
OTLP gRPC/HTTP push servers — a Parquet fragment plays the role of one
OTLP export request."""
