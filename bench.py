"""Benchmark harness: flagship rollup+downsample throughput.

Prints ONE JSON line:
  {"metric": "rollup_downsample_throughput", "value": <headline sec>,
   "unit": "sec", "queries": {...per-pipeline sec...}, "sf": ..., "num_cpus": N,
   "sequences_per_sec": ...}

Env:
  GRAFT_SF_DIR    input dir (default /root/testdata/sf0.1) — sets the scale
  RAY_GRAFT_CPUS  num_cpus for ray.init (default 32)

--scaling: runs the headline pipeline in two fresh subprocesses at
num_cpus=8 and num_cpus=32 on the same input and reports throughputs +
scaling efficiency (the sandbox substitute for N vs 4N nodes).
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time


def run_benchmarks() -> dict:
    import ray

    num_cpus = int(os.environ.get("RAY_GRAFT_CPUS", "32"))
    sf_dir = os.environ.get("GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = os.path.basename(os.path.normpath(sf_dir))
    sf_val = float(sf[2:]) if sf.startswith("sf") else 0.1

    ray.init(
        address="local",
        num_cpus=num_cpus,
        include_dashboard=False,
        ignore_reinit_error=True,
        logging_level="ERROR",
    )
    from ray.data import DataContext

    ctx = DataContext.get_current()
    ctx.enable_progress_bars = False

    from dtaidistance_ray.pipelines.flagship import run_flagship
    from dtaidistance_ray.sources.synth import TokenTableSpec, token_table
    from dtaidistance_ray.stages import events
    from dtaidistance_ray.stages.relational import lineitem_pricing_summary

    spec = TokenTableSpec.for_sf(sf_val)
    # warm the page cache / ray workers with one untimed pass
    token_table(TokenTableSpec(num_rows=2000)).count()

    queries: dict = {}

    t0 = time.perf_counter()
    metrics = run_flagship(spec, out_dir=None)
    headline = time.perf_counter() - t0
    queries["flagship_rollup_3tiers"] = round(headline, 3)

    t0 = time.perf_counter()
    events.rollup_hourly(sf_dir).to_pandas()
    queries["rollup_events_hourly"] = round(time.perf_counter() - t0, 3)

    t0 = time.perf_counter()
    events.sessionize(sf_dir).to_pandas()
    queries["events_sessionize"] = round(time.perf_counter() - t0, 3)

    t0 = time.perf_counter()
    lineitem_pricing_summary(sf_dir).to_pandas()
    queries["lineitem_pricing_summary"] = round(time.perf_counter() - t0, 3)

    result = {
        "metric": "rollup_downsample_throughput",
        "value": round(headline, 3),
        "unit": "sec",
        "queries": queries,
        "sf": sf_val,
        "num_cpus": num_cpus,
        "num_sequences": spec.num_rows,
        "sequences_per_sec": round(spec.num_rows / headline, 1),
    }
    ray.shutdown()
    return result


def run_scaling() -> dict:
    """Same job at num_cpus=8 and 32 in fresh processes; efficiency =
    (T8/T32)/4 (1.0 = linear)."""

    def run(ncpu: int) -> dict:
        env = dict(os.environ, RAY_GRAFT_CPUS=str(ncpu))
        out = subprocess.run(
            [sys.executable, os.path.abspath(__file__)],
            env=env,
            capture_output=True,
            text=True,
            check=True,
            cwd=os.path.dirname(os.path.abspath(__file__)),
        ).stdout
        return json.loads(out.strip().splitlines()[-1])

    lo, hi = run(8), run(32)
    eff = (lo["value"] / hi["value"]) / (32 / 8)
    return {
        "metric": "scaling_efficiency",
        "sec_8cpu": lo["value"],
        "sec_32cpu": hi["value"],
        "seq_per_sec_8cpu": lo["sequences_per_sec"],
        "seq_per_sec_32cpu": hi["sequences_per_sec"],
        "scaling_efficiency": round(eff, 3),
        "sf": lo["sf"],
        "num_sequences": lo["num_sequences"],
    }


if __name__ == "__main__":
    if "--scaling" in sys.argv:
        print(json.dumps(run_scaling()))
    else:
        print(json.dumps(run_benchmarks()))
