"""Scaling-efficiency harness (north_rule: >=0.8 from N to 4N executors;
sandbox proxy per driver instruction: local[8] vs local[32] on the same
input). Writes BENCH/BASELINE.md.

    python BENCH/run_scaling.py [n_low] [n_high]
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def run(cpus: int) -> dict:
    env = dict(os.environ, SPARK_GRAFT_CPUS=str(cpus))
    out = subprocess.run(
        [sys.executable, os.path.join(REPO, "bench.py")],
        capture_output=True, text=True, env=env, timeout=3600,
    )
    line = [l for l in out.stdout.splitlines() if l.startswith("{")][-1]
    return json.loads(line)


def main() -> None:
    n_low = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    n_high = int(sys.argv[2]) if len(sys.argv) > 2 else 32
    lo = run(n_low)
    hi = run(n_high)
    eff = (hi["value"] / lo["value"]) / (n_high / n_low)
    md = f"""# BENCH/BASELINE.md — throughput + scaling efficiency

Primary metric (BASELINE.json): rolled-up points/sec through
series → compress (codec UDF) → chunk store → decode → 1m/1h/1d tiers,
deterministic pages table ({lo['n_points']:,} points), same input at two
parallelism levels (sandbox proxy for N vs 4N executors per driver
instruction).

| parallelism | points/sec | pipeline sec | compress s | decode+rollup s |
|---|---|---|---|---|
| local[{n_low}] (N) | {lo['value']:,} | {lo['pipeline_sec']} | {lo['queries']['compress_write']} | {lo['queries']['decode_rollup_tiers_write']} |
| local[{n_high}] (4N) | {hi['value']:,} | {hi['pipeline_sec']} | {hi['queries']['compress_write']} | {hi['queries']['decode_rollup_tiers_write']} |

**Scaling efficiency N→4N: {eff:.3f}** (target ≥ 0.8 — north_rule).

Reference single-node numbers (BASELINE.md): compression 88 MB/s on 20
threads ≈ {88/44*1e6:,.0f} points/sec at our 44 B/point row width;
decompression 22 MB/s single-threaded.

raw JSON:

```json
{json.dumps(lo)}
{json.dumps(hi)}
```
"""
    with open(os.path.join(REPO, "BENCH", "BASELINE.md"), "w") as f:
        f.write(md)
    print(md)


if __name__ == "__main__":
    main()
