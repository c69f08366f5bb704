"""Standalone pipeline CLI — parity with the reference's
`docetl/scripts/run_pipeline.py` entry point (SURVEY.md §3.3):

    python -m etl_poc_spark.cli --config pipeline.yaml \
        [--input DIR] [--output out.json] [--summary summary.json] \
        [--provider stub] [--cpus 8]

- `--input` rewrites dataset paths the way the reference's
  `update_config_paths` rewrites `/data/input` prefixes (run_pipeline.py:40-65):
  any dataset path starting with the config's declared base (or `/data/input`)
  is re-rooted under --input.
- `--output` materializes the final step as list-of-records JSON (S6).
- `--summary` writes run stats: per-step row counts, valid-row counts,
  wall time (run_pipeline.py:123-156's stats shape).
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time
from typing import Any

import yaml


_CONFIG_VAR = None  # compiled lazily; see render_config_template


def render_config_template(text: str, variables: dict[str, str]) -> str:
    """Render a `[[ var ]]`-templated pipeline config — parity with the
    reference's config-render step (zara_hybrid_etl.py:176-192), which
    uses jinja2 with variable delimiters switched to `[[ ... ]]` so the
    DocETL `{{ input.x }}` PROMPT templates inside the YAML pass through
    untouched. The reference's template uses pure variable substitution
    (no loops/conditionals), so this is a dependency-free regex render;
    unknown variables raise instead of silently rendering empty (a
    deliberate narrowing of jinja's permissive default — a missing
    dataset path should fail at render time, not as a confusing
    downstream read error)."""
    import re

    global _CONFIG_VAR
    if _CONFIG_VAR is None:
        _CONFIG_VAR = re.compile(r"\[\[\s*([A-Za-z_][A-Za-z0-9_]*)\s*\]\]")

    def sub(m: "re.Match[str]") -> str:
        name = m.group(1)
        if name not in variables:
            raise KeyError(
                f"config template references undefined variable {name!r} "
                f"(pass --var {name}=...)"
            )
        return str(variables[name])

    return _CONFIG_VAR.sub(sub, text)


def rewrite_paths(config: dict[str, Any], input_dir: str | None, base: str = "/data/input") -> dict[str, Any]:
    if not input_dir:
        return config
    cfg = json.loads(json.dumps(config))  # deep copy
    for spec in (cfg.get("datasets") or {}).values():
        path = spec.get("path")
        if isinstance(path, str) and path.startswith(base):
            spec["path"] = os.path.join(input_dir, os.path.relpath(path, base))
    return cfg


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser(prog="etl_poc_spark", description="Run a YAML pipeline on Spark")
    ap.add_argument("--config", required=True, help="pipeline YAML")
    ap.add_argument("--input", default=None, help="re-root /data/input dataset paths here")
    ap.add_argument("--output", default=None, help="write final step as JSON records")
    ap.add_argument("--summary", default=None, help="write run summary JSON")
    ap.add_argument("--provider", default="stub", help="LLM provider name (default: stub)")
    ap.add_argument("--cpus", type=int, default=None, help="local[N] parallelism")
    ap.add_argument("--timeout", type=float, default=3600.0,
                    help="wall-clock budget in seconds (reference operator default: 3600)")
    ap.add_argument("--retries", type=int, default=1, help="extra attempts after a failure")
    ap.add_argument("--retry-delay", type=float, default=0.0, help="seconds between attempts")
    ap.add_argument("--errors-dir", default=None,
                    help="quarantine directory for failure records (S9 error sink)")
    ap.add_argument("--var", action="append", default=[], metavar="KEY=VALUE",
                    help="config-template variable for [[ key ]] placeholders "
                         "(repeatable; the reference's .yaml.j2 convention)")
    args = ap.parse_args(argv)

    with open(args.config, encoding="utf-8") as f:
        raw = f.read()
    if args.var or args.config.endswith(".j2"):
        for v in args.var:
            if "=" not in v:
                ap.error(
                    f"--var expects KEY=VALUE, got {v!r}"
                )
        variables = dict(v.split("=", 1) for v in args.var)
        raw = render_config_template(raw, variables)
    config = yaml.safe_load(raw)
    config = rewrite_paths(config, args.input)

    from etl_poc_spark.llm.provider import get_provider
    from etl_poc_spark.plans.harness import run_with_harness
    from etl_poc_spark.plans.yaml_pipeline import run_pipeline
    from etl_poc_spark.session import get_spark
    from etl_poc_spark.sinks.sinks import write_json_records

    t0 = time.perf_counter()
    spark = get_spark("etl_poc_spark_cli", cpus=args.cpus)
    provider = get_provider(args.provider)

    if "streaming" in config:
        # continuous surface: streaming.op over a landing-zone source,
        # run to completion of the available data (availableNow)
        from etl_poc_spark.plans.yaml_pipeline import run_streaming_pipeline

        try:
            stream_summary = run_streaming_pipeline(
                spark, config, timeout_seconds=args.timeout
            )
        except Exception as e:  # noqa: BLE001 — report and exit nonzero
            print(json.dumps({"error": str(e), "type": type(e).__name__,
                              "config": os.path.abspath(args.config)}), file=sys.stderr)
            return 1
        summary = {
            "config": os.path.abspath(args.config),
            "streaming": stream_summary,
            "wall_seconds": round(time.perf_counter() - t0, 3),
        }
        if args.summary:
            os.makedirs(os.path.dirname(args.summary) or ".", exist_ok=True)
            with open(args.summary, "w", encoding="utf-8") as f:
                json.dump(summary, f, indent=2)
        print(json.dumps(summary))
        # a timed-out availableNow run was stopped MID-INGEST — partial
        # state must surface in the exit code, not just the summary JSON
        return 2 if stream_summary.get("timed_out") else 0

    def body() -> tuple[dict[str, Any], Any]:
        frames = run_pipeline(spark, config, provider=provider)
        steps: dict[str, Any] = {}
        for name, df in frames.items():
            if name == "__final__":
                continue
            n = df.count()
            n_valid = df.filter("_valid").count() if "_valid" in df.columns else None
            steps[name] = {"rows": n, **({"valid_rows": n_valid} if n_valid is not None else {})}
        n_out = None
        if args.output:
            n_out = write_json_records(frames["__final__"], args.output, single_file=True)
        return steps, n_out

    try:
        steps, n_out = run_with_harness(
            spark,
            body,
            timeout_seconds=args.timeout,
            retries=args.retries,
            retry_delay_seconds=args.retry_delay,
            errors_dir=args.errors_dir,
            context={"config": os.path.abspath(args.config), "provider": args.provider},
        )
    except Exception as e:  # noqa: BLE001 — quarantined by the harness; report and exit nonzero
        # (KeyboardInterrupt/SystemExit propagate — Ctrl+C keeps its
        # conventional interrupt behavior instead of exiting 1 with JSON)
        print(json.dumps({"error": str(e), "type": type(e).__name__,
                          "config": os.path.abspath(args.config)}), file=sys.stderr)
        return 1

    summary = {
        "config": os.path.abspath(args.config),
        "steps": steps,
        "output_rows": n_out,
        "wall_seconds": round(time.perf_counter() - t0, 3),
        "provider": args.provider,
    }
    if args.summary:
        os.makedirs(os.path.dirname(args.summary) or ".", exist_ok=True)
        with open(args.summary, "w", encoding="utf-8") as f:
            json.dump(summary, f, indent=2)
    print(json.dumps(summary))
    return 0


if __name__ == "__main__":
    sys.exit(main())
