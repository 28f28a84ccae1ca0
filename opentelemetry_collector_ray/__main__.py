"""CLI entry point — the otelcol binary analog (SURVEY.md §3.1).

    python -m opentelemetry_collector_ray --config pipeline.yaml \
        [--config override.yaml ...] --out /tmp/out
        [--no-resume] [--num-cpus N]

Repeated ``--config`` flags resolve through the confmap multi-source
merge (later files override, the otelcol ``--config`` semantics). Owns
the Ray session (library code never calls ray.init — driver contract).
"""

from __future__ import annotations

import argparse
import json
import sys


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser(prog="opentelemetry_collector_ray")
    ap.add_argument("--config", required=True, action="append",
                    help="pipeline YAML (repeatable; later files override)")
    ap.add_argument("--out", required=True, help="output root (sinks + manifests)")
    ap.add_argument("--no-resume", action="store_true",
                    help="force full recompute (ignore committed manifests)")
    ap.add_argument("--num-cpus", type=int, default=None)
    args = ap.parse_args(argv)

    import ray

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=args.num_cpus,
                 include_dashboard=False, logging_level="ERROR")
    try:
        from ray.data import DataContext

        DataContext.get_current().enable_progress_bars = False
        from .config import PipelineConfig
        from .pipelines.builder import run_pipeline

        cfg = PipelineConfig.from_sources(args.config)
        result = run_pipeline(cfg, args.out, resume=not args.no_resume)
        print(json.dumps(result))
        return 0
    finally:
        ray.shutdown()


if __name__ == "__main__":
    sys.exit(main())
