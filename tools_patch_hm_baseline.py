"""One-shot: re-measure the H&M torch-CPU baseline over N median-timed steps
(VERDICT r4 weak #7 — the committed artifact still carried steps_measured=1)
and patch BENCH_HM.json in place, recomputing vs_baseline_measured against
the artifact's own committed TPU rate. Avoids re-rolling the 53-minute
convergence tier for a baseline-only honesty fix.

Run UNCONTENDED (the 2-core host must not be sharing with a sampler loop —
a slowed torch baseline would inflate vs_baseline in our favor).
"""
import json
import sys

import numpy as np

STEPS = int(sys.argv[1]) if len(sys.argv) > 1 else 3

import bench_hm  # noqa: E402  (loads the clustered-edge cache)

z = np.load(f"/tmp/hm_clustered_{bench_hm.NUM_USERS}_{bench_hm.NUM_ITEMS}_"
            f"{bench_hm.NUM_CLUSTERS}.npz")
eu, ei = z["eu"], z["ei"]
print(f"edges: {len(eu)}")
cpu_eps = bench_hm.bench_cpu_measured(eu, ei, STEPS)
print(f"torch-CPU median of {STEPS}: {cpu_eps/1e6:.2f}M edges/s")

d = json.load(open("BENCH_HM.json"))
tpu_eps = d["train"]["edges_per_sec_per_chip"]
d["torch_cpu_edges_per_sec_measured"] = round(cpu_eps, 1)
d["torch_cpu_steps_measured"] = STEPS
d["vs_baseline_measured"] = round(tpu_eps / cpu_eps, 2)
json.dump(d, open("BENCH_HM.json.tmp", "w"), indent=1)
import os  # noqa: E402

os.replace("BENCH_HM.json.tmp", "BENCH_HM.json")
print(json.dumps({k: d[k] for k in (
    "torch_cpu_edges_per_sec_measured", "torch_cpu_steps_measured",
    "vs_baseline_measured")}))
