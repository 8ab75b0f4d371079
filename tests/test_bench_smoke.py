"""bench.py smoke: the driver invokes it directly, so its interface
(one JSON line, required keys) is regression-tested at tiny scale."""

import json
import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


class TestBenchSmoke:
    def test_bench_json_contract(self):
        env = dict(
            os.environ,
            GRAFT_SF_DIR="/root/testdata/sf0.001",
            RAY_GRAFT_CPUS="4",
        )
        out = subprocess.run(
            [sys.executable, "bench.py"],
            env=env,
            capture_output=True,
            text=True,
            cwd=REPO,
            timeout=240,
        )
        assert out.returncode == 0, out.stderr[-2000:]
        line = out.stdout.strip().splitlines()[-1]
        d = json.loads(line)
        for key in ("metric", "value", "unit", "queries", "sf", "num_cpus",
                    "sequences_per_sec"):
            assert key in d, key
        assert d["unit"] == "sec"
        assert d["value"] > 0
        assert "flagship_rollup_3tiers" in d["queries"]
        # best-of-2 protocol: the headline is the min of both attempts
        assert len(d["flagship_attempts"]) == 2
        assert d["value"] == min(d["flagship_attempts"])
