"""CLI entry point — the `ray job submit` surface of the engine.

    ray job submit -- python -m dtaidistance_ray.cli \
        --sf 0.1 --out /data/rollup_out --num-shards 64

Runs the flagship rollup+downsample+retention pipeline end-to-end with
checkpointed output (resumable: rerunning skips validated shards).
Owns its Ray session (guarded init, shutdown at exit) — library code
never calls ray.init.
"""

from __future__ import annotations

import argparse
import json
import sys


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(description="dtaidistance_ray flagship rollup")
    ap.add_argument("--sf", type=float, default=0.01, help="scale factor (rows = sf * 2e6)")
    ap.add_argument("--rows", type=int, default=None, help="explicit row count (overrides --sf)")
    ap.add_argument("--input", type=str, default=None, help="read token table parquet instead of synthesizing")
    ap.add_argument("--out", type=str, default=None, help="checkpointed output dir (omit: dry run)")
    ap.add_argument("--num-shards", type=int, default=16)
    ap.add_argument("--no-resume", action="store_true")
    ap.add_argument("--num-cpus", type=int, default=None, help="local ray.init num_cpus (omit: auto)")
    ap.add_argument(
        "--expire",
        action="store_true",
        help="after the run, apply the retention policy to --out "
        "(tier-0 keeps --keep0 buckets, tier-1 --keep1; tier-2 forever)",
    )
    ap.add_argument("--keep0", type=int, default=48, help="tier-0 TTL in 1h buckets")
    ap.add_argument("--keep1", type=int, default=42, help="tier-1 TTL in 4h buckets")
    ap.add_argument(
        "--compact",
        type=int,
        default=None,
        metavar="N",
        help="after the run (and any --expire sweep), compact every tier "
        "of --out into N shards (atomic tier swap, lineage manifests)",
    )
    ap.add_argument(
        "--stats",
        action="store_true",
        help="print store_stats of --out (manifest/parquet integrity, "
        "per-tier spans) WITHOUT running the pipeline",
    )
    ap.add_argument(
        "--serve",
        nargs=3,
        default=None,
        metavar=("SOURCE", "LO_HOUR", "HI_HOUR"),
        help="serve [LO_HOUR, HI_HOUR) tier-0 hours for SOURCE from the "
        "--out store (finest-retained-tier per hour) WITHOUT running "
        "the pipeline; prints one JSON row per hour",
    )
    args = ap.parse_args(argv)

    # store-maintenance verbs operate on an existing store, Ray-free
    if args.stats or args.serve:
        if not args.out:
            ap.error("--stats/--serve require --out")
        result = {}
        if args.stats:
            from dtaidistance_ray.state.checkpoint import store_stats

            result["stats"] = store_stats(args.out)
        if args.serve:
            from dtaidistance_ray.pipelines.serve import serve_range

            source, lo, hi = args.serve[0], int(args.serve[1]), int(args.serve[2])
            result["serve"] = serve_range(args.out, source, lo, hi).to_dict("records")
        print(json.dumps(result, default=str))
        return 0

    import ray

    if not ray.is_initialized():
        kwargs = {"include_dashboard": False, "ignore_reinit_error": True, "logging_level": "ERROR"}
        if args.num_cpus:
            kwargs["num_cpus"] = args.num_cpus
        ray.init(address="local", **kwargs)
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    from dtaidistance_ray.pipelines.flagship import run_flagship
    from dtaidistance_ray.sources.synth import TokenTableSpec

    spec = (
        TokenTableSpec(num_rows=args.rows) if args.rows else TokenTableSpec.for_sf(args.sf)
    )
    metrics = run_flagship(
        spec,
        out_dir=args.out,
        num_shards=args.num_shards,
        resume=not args.no_resume,
        input_path=args.input,
    )
    if args.expire and args.out:
        from dtaidistance_ray.state.checkpoint import expire_checkpoint

        metrics["retention"] = expire_checkpoint(args.out, keeps=(args.keep0, args.keep1, None))
    if args.compact and args.out:
        from dtaidistance_ray.state.checkpoint import compact_store

        metrics["compaction"] = compact_store(args.out, target_shards=args.compact)
    print(json.dumps(metrics, default=str))
    ray.shutdown()
    return 0


if __name__ == "__main__":
    sys.exit(main())
