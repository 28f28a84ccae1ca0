"""opentelemetry_collector_ray — a Ray-Data-native batch log pipeline engine.

A from-scratch reimplementation of the OpenTelemetry Collector's
receiver → processor → exporter pipeline (reference:
/root/reference, open-telemetry/opentelemetry-collector) as a batch
engine over Parquet transcript tables, built on ``ray.data.Dataset``.

Architecture (SURVEY.md §1.5, §7):

- The pdata ``plog.Logs`` batch (reference ``pdata/plog/generated_logs.go``)
  maps to an Arrow block; a ``ray.data.Dataset`` is a whole pipeline edge.
- Per-record processors (reference ``processor/processorhelper/logs.go:22``)
  map to vectorized ``map_batches(fn, batch_format="pyarrow")`` stages.
- Stateful components (enrichment dictionaries, compiled rulesets) are
  callable classes run as actor pools.
- Routing connectors (reference ``connector/logs_router.go:19-71``) become a
  vectorized first-match rule stage adding a ``route`` column plus
  per-route partitioned Parquet sinks.
- The persistent exporter queue (reference
  ``exporter/exporterhelper/internal/queue/persistent_queue.go``) becomes a
  per-partition lineage manifest with atomic commit + resume.
"""

__version__ = "0.1.0"
