#!/usr/bin/env python3
"""Measured multi-host scaling efficiency of the sharded inference program.

BASELINE.json's north star asks >=80% throughput scaling to >=2 hosts.  The
compile-time half of the proof is analyze_scaling.py (the data-parallel
program carries ZERO collectives); this script supplies the measured half on
the only multi-host fabric available in this environment: N local processes
emulating N single-device hosts, each pinned to its OWN physical core
(sched_setaffinity) so the "hosts" do not steal each other's cycles, talking
through the real jax.distributed / gRPC coordination path.

Weak scaling: every host feeds the same local batch; the global program at
n hosts processes n x local_batch per iteration.  Each process reports its
own wall time for the iteration loop; GLOBAL throughput divides global
frames by the SLOWEST process (true completion time), and

    efficiency(n) = fps_global(n) / (n * fps_global(1))

Measurement protocol (round 5 — the round-4 artifact committed a single
0.672 run while the same test passed >=0.8 in-session, i.e. the number was
noise-dominated): the harness host has very few cores (2 here), so ANY
background load lands directly on one emulated host and shows up as
imbalance.  This version

* runs `--reps` PAIRED (1-host, 2-host) repetitions back-to-back so both
  configs sample the same background-noise environment, and publishes the
  MEDIAN efficiency with min/max spread over the pairs;
* records per-process per-repetition wall times + loadavg so an imbalanced
  run is diagnosable from the artifact instead of mysterious;
* adds a 4-emulated-host point for the trend.  4 processes on 2 physical
  cores are 2x oversubscribed BY CONSTRUCTION, so the raw 4-host
  efficiency is bounded near 0.5 by the harness, not the framework; the
  artifact therefore also reports the CORE-NORMALIZED efficiency
  fps(4) / (min(4, n_cores) * fps(1)) — what the coordination layer costs
  once compute is capped by physical cores.

Run:  python scripts/scaling_bench.py --out SCALING_r05.json
"""

import argparse
import json
import os
import pathlib
import socket
import statistics
import subprocess
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

_WORKER = r"""
import json, os, sys, time
proc_id, n_proc, port, batch, iters, inner = (int(v) for v in sys.argv[1:7])
# one emulated host = one physical core + one XLA device
try:
    os.sched_setaffinity(0, {proc_id % os.cpu_count()})
except (AttributeError, OSError):
    pass
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=1"
import jax
jax.config.update("jax_platforms", "cpu")
if n_proc > 1:
    jax.distributed.initialize(coordinator_address=f"127.0.0.1:{port}",
                               num_processes=n_proc, process_id=proc_id)
import numpy as np
import jax.numpy as jnp
from openpose_tpu.models import zoo
from openpose_tpu.params import PoseModel
from openpose_tpu.parallel import mesh as mesh_lib
from openpose_tpu.parallel.inference import ShardedPoseInference

assert len(jax.devices()) == n_proc
model = zoo.load_pose_model(PoseModel.MPI_15_4)
mesh = mesh_lib.make_mesh()              # pure data parallel
inf = ShardedPoseInference(model, mesh, net_hw=(64, 64), max_peaks=16,
                           compute_dtype=jnp.float32)
local = np.random.RandomState(proc_id).randint(
    0, 255, (batch, 64, 64, 3)).astype(np.uint8)
for _ in range(3):                       # compile + steady-state warmup
    jax.block_until_ready(inf(local))

dts = []
for _rep in range(inner):
    t0 = time.perf_counter()
    for _ in range(iters):
        out = inf(local)
        jax.block_until_ready(out)
    dts.append(time.perf_counter() - t0)
print("RESULT " + json.dumps({
    "proc": proc_id, "dts": dts,
    "local_frames": batch * iters}), flush=True)
"""

# Collective census of the SAME program over an 8-device single-process
# mesh (the multi-process mesh cannot lower a global-shape dummy from one
# process; the sharding strategy and hence the HLO collective structure is
# identical — analyze_scaling.py proves the same fact round-to-round).
_HLO_WORKER = r"""
import json, os, sys
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=8"
import jax
jax.config.update("jax_platforms", "cpu")
import re
import jax.numpy as jnp
from openpose_tpu.models import zoo
from openpose_tpu.params import PoseModel
from openpose_tpu.parallel import mesh as mesh_lib
from openpose_tpu.parallel.inference import ShardedPoseInference

model = zoo.load_pose_model(PoseModel.MPI_15_4)
mesh = mesh_lib.make_mesh()
inf = ShardedPoseInference(model, mesh, net_hw=(64, 64), max_peaks=16,
                           compute_dtype=jnp.float32)
hlo = inf._fn.lower(inf.params, jax.device_put(
    jnp.zeros((8, 64, 64, 3), jnp.uint8),
    mesh_lib.batch_sharding(mesh))).compile().as_text()
counts = {}
for op in ("all-reduce", "all-gather", "reduce-scatter",
           "collective-permute", "all-to-all"):
    n = len(re.findall(rf"^\s*%?\S+ = \S+ {op}(?:-start)?\(", hlo, re.M))
    if n:
        counts[op] = n
print("RESULT " + json.dumps(counts), flush=True)
"""


def _env():
    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)
    env["PYTHONPATH"] = (str(pathlib.Path(__file__).resolve().parents[1])
                         + os.pathsep + env.get("PYTHONPATH", ""))
    return env


def run_config(n_proc: int, batch: int, iters: int, inner: int,
               workdir: pathlib.Path) -> dict:
    """One launch of n_proc emulated hosts; `inner` timed repetitions each.

    Per-repetition global fps pairs repetition i across processes (no
    cross-process barrier exists inside the run — the program is
    collective-free — but launches are near-simultaneous and each rep is
    several seconds, so rep i samples the same wall-clock window)."""
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]
    script = workdir / "scaling_worker.py"
    script.write_text(_WORKER)
    procs = [subprocess.Popen(
        [sys.executable, str(script), str(i), str(n_proc), str(port),
         str(batch), str(iters), str(inner)], env=_env(),
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True)
        for i in range(n_proc)]
    results = []
    for i, p in enumerate(procs):
        out, _ = p.communicate(timeout=1800)
        if p.returncode != 0:
            for q in procs:
                q.kill()
            raise RuntimeError(f"proc {i} failed:\n{out[-3000:]}")
        for line in out.splitlines():
            if line.startswith("RESULT "):
                results.append(json.loads(line[len("RESULT "):]))
    assert len(results) == n_proc, results
    global_frames = sum(r["local_frames"] for r in results)
    # rep-wise slowest process -> rep-wise global fps
    rep_fps = [global_frames / max(r["dts"][k] for r in results)
               for k in range(len(results[0]["dts"]))]
    return {"n_hosts": n_proc,
            "global_fps_best": max(rep_fps),
            "global_fps_median": statistics.median(rep_fps),
            "rep_fps": [round(f, 2) for f in rep_fps],
            "per_proc_dts": {r["proc"]: [round(d, 3) for d in r["dts"]]
                             for r in results}}


def collective_census(workdir: pathlib.Path) -> dict:
    script = workdir / "scaling_hlo.py"
    script.write_text(_HLO_WORKER)
    out = subprocess.run([sys.executable, str(script)], env=_env(),
                         capture_output=True, text=True, timeout=1800)
    if out.returncode != 0:
        raise RuntimeError(f"hlo census failed:\n{out.stdout[-2000:]}"
                           f"\n{out.stderr[-2000:]}")
    for line in out.stdout.splitlines():
        if line.startswith("RESULT "):
            return json.loads(line[len("RESULT "):])
    raise RuntimeError("no RESULT line from hlo census")


def measure(batch: int = 8, iters: int = 10, reps: int = 5,
            inner: int = 2,
            workdir: pathlib.Path = pathlib.Path("/tmp"),
            four_host: bool = True) -> dict:
    n_cores = os.cpu_count() or 1
    load_start = os.getloadavg()
    pair_effs = []
    pair_detail = []
    for rep in range(reps):
        one = run_config(1, batch, iters, inner, workdir)
        two = run_config(2, batch, iters, inner, workdir)
        eff = two["global_fps_median"] / (2 * one["global_fps_median"])
        eff_best = two["global_fps_best"] / (2 * one["global_fps_best"])
        pair_effs.append(eff)
        pair_detail.append({"pair": rep, "efficiency_median": round(eff, 4),
                            "efficiency_best": round(eff_best, 4),
                            "one_host": one, "two_hosts": two})
        print(f"pair {rep}: eff(median)={eff:.4f} eff(best)={eff_best:.4f}",
              file=sys.stderr, flush=True)
    one_fps = statistics.median(
        p["one_host"]["global_fps_median"] for p in pair_detail)
    if four_host:
        four = run_config(4, batch, iters, inner, workdir)
        eff4_raw = four["global_fps_median"] / (4 * one_fps)
        eff4_norm = four["global_fps_median"] / (min(4, n_cores) * one_fps)
    else:
        four, eff4_raw, eff4_norm = None, 0.0, 0.0
    load_end = os.getloadavg()
    return {
        "config": "MPI_15_4 64x64 f32, 1 CPU device/host, "
                  f"local batch {batch}, {iters} iters x {inner} reps, "
                  f"{reps} paired launches",
        "n_physical_cores": n_cores,
        "efficiency_2_hosts_median": round(statistics.median(pair_effs), 4),
        "efficiency_2_hosts_min": round(min(pair_effs), 4),
        "efficiency_2_hosts_max": round(max(pair_effs), 4),
        "pairs": pair_detail,
        "four_hosts": four,
        "efficiency_4_hosts_raw": round(eff4_raw, 4),
        "efficiency_4_hosts_core_normalized": round(eff4_norm, 4),
        "four_host_note": (
            f"4 emulated hosts share {n_cores} physical cores "
            f"({max(1, 4 // max(n_cores, 1))}x oversubscribed): the raw "
            "efficiency is harness-bounded near "
            f"{min(4, n_cores) / 4:.2f}; the core-normalized number "
            "isolates coordination-layer cost"),
        "loadavg_start": load_start, "loadavg_end": load_end,
        "collectives_inference": collective_census(workdir),
    }


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--iters", type=int, default=10)
    ap.add_argument("--reps", type=int, default=5)
    ap.add_argument("--inner", type=int, default=2)
    ap.add_argument("--out", default="SCALING_r05.json")
    args = ap.parse_args(argv)
    report = measure(args.batch, args.iters, args.reps, args.inner)
    print(json.dumps(report, indent=2))
    if args.out:
        pathlib.Path(args.out).write_text(json.dumps(report, indent=2))
    return 0


if __name__ == "__main__":
    sys.exit(main())
