"""Engine CLI — invocation replaces infrastructure triggers.

The reference needed a CDK-provisioned ON_DEMAND Glue trigger to run a
pipeline (templates/cds_view_template.py:18-23) and a Lambda to chain the
prepared job (lambda/invoke_prepared.py).  Here a trigger is a process
invocation::

    python -m aws_genaric_datapipeline_spark ingest  --pipelines ./pipelines --job-src tableA
    python -m aws_genaric_datapipeline_spark promote --pipelines ./pipelines --job-src tableA
    python -m aws_genaric_datapipeline_spark promote-stream --pipelines ./pipelines \
        --job-src tableA --checkpoint /tmp/ckpt
    python -m aws_genaric_datapipeline_spark list    --pipelines ./pipelines
"""

from __future__ import annotations

import argparse
import json
import sys

from aws_genaric_datapipeline_spark.config import discover_pipelines
from aws_genaric_datapipeline_spark.pipeline.jobs import build_pipeline
from aws_genaric_datapipeline_spark.session import get_spark


def _pipeline(args):
    cfgs = discover_pipelines(args.pipelines, base_dir=args.base_dir)
    if args.job_src not in cfgs:
        sys.exit(f"unknown job_src {args.job_src!r}; discovered: {sorted(cfgs)}")
    spark = get_spark(app_name=f"engine-{args.command}-{args.job_src}")
    return build_pipeline(spark, cfgs[args.job_src])


def main(argv: list[str] | None = None) -> None:
    ap = argparse.ArgumentParser(prog="aws_genaric_datapipeline_spark")
    sub = ap.add_subparsers(dest="command", required=True)

    common = argparse.ArgumentParser(add_help=False)
    common.add_argument("--pipelines", required=True, help="pipelines/ config directory")
    common.add_argument("--base-dir", default=None, help="root for reference-layout bucket paths")

    p_list = sub.add_parser("list", parents=[common], help="list discovered pipelines")

    for name, helptext in (
        ("ingest", "run one raw-layer ingestion batch"),
        ("promote", "promote pending raw batches to prepared"),
        ("promote-stream", "run the streaming promoter (availableNow drain)"),
    ):
        sp = sub.add_parser(name, parents=[common], help=helptext)
        sp.add_argument("--job-src", required=True)
        if name == "promote-stream":
            sp.add_argument("--checkpoint", required=True)

    args = ap.parse_args(argv)

    if args.command == "list":
        cfgs = discover_pipelines(args.pipelines, base_dir=args.base_dir)
        for src, cfg in sorted(cfgs.items()):
            print(json.dumps({"job_src": src, "template": cfg.template, "stack": cfg.stack_name}))
        return

    pipe = _pipeline(args)
    if args.command == "ingest":
        batch = pipe.ingest()
        print(json.dumps({"ingested": batch}))
    elif args.command == "promote":
        done = pipe.promote()
        print(json.dumps({"promoted": done}))
    elif args.command == "promote-stream":
        from aws_genaric_datapipeline_spark.streaming.promote import run_streaming_promoter

        done = run_streaming_promoter(pipe, args.checkpoint)
        print(json.dumps({"promoted": done}))


if __name__ == "__main__":
    main()
