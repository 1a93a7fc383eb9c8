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

Writes SCALING_r{round}.json with the per-config rates, the efficiency, and
the collective-instruction counts of the compiled program (expected: {}).

Run:  python scripts/scaling_bench.py --out SCALING_r04.json
"""

import argparse
import json
import os
import pathlib
import socket
import subprocess
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

_WORKER = r"""
import json, os, sys, time
proc_id, n_proc, port, batch, iters = (int(v) for v in sys.argv[1:6])
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

best_dt = float("inf")
for _rep in range(3):
    t0 = time.perf_counter()
    for _ in range(iters):
        out = inf(local)
        jax.block_until_ready(out)
    best_dt = min(best_dt, time.perf_counter() - t0)
print("RESULT " + json.dumps({
    "proc": proc_id, "dt": best_dt,
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


def run_config(n_proc: int, batch: int, iters: int, workdir: pathlib.Path):
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]
    script = workdir / "scaling_worker.py"
    script.write_text(_WORKER)
    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)
    env["PYTHONPATH"] = (str(pathlib.Path(__file__).resolve().parents[1])
                         + os.pathsep + env.get("PYTHONPATH", ""))
    procs = [subprocess.Popen(
        [sys.executable, str(script), str(i), str(n_proc), str(port),
         str(batch), str(iters)], env=env,
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True)
        for i in range(n_proc)]
    results = []
    for i, p in enumerate(procs):
        out, _ = p.communicate(timeout=1200)
        if p.returncode != 0:
            for q in procs:
                q.kill()
            raise RuntimeError(f"proc {i} failed:\n{out[-3000:]}")
        for line in out.splitlines():
            if line.startswith("RESULT "):
                results.append(json.loads(line[len("RESULT "):]))
    assert len(results) == n_proc, results
    global_frames = sum(r["local_frames"] for r in results)
    slowest = max(r["dt"] for r in results)
    return {"n_hosts": n_proc, "global_fps": global_frames / slowest,
            "per_proc_dt": [r["dt"] for r in results]}


def collective_census(workdir: pathlib.Path) -> dict:
    script = workdir / "scaling_hlo.py"
    script.write_text(_HLO_WORKER)
    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)
    env["PYTHONPATH"] = (str(pathlib.Path(__file__).resolve().parents[1])
                         + os.pathsep + env.get("PYTHONPATH", ""))
    out = subprocess.run([sys.executable, str(script)], env=env,
                         capture_output=True, text=True, timeout=1200)
    if out.returncode != 0:
        raise RuntimeError(f"hlo census failed:\n{out.stdout[-2000:]}"
                           f"\n{out.stderr[-2000:]}")
    for line in out.stdout.splitlines():
        if line.startswith("RESULT "):
            return json.loads(line[len("RESULT "):])
    raise RuntimeError("no RESULT line from hlo census")


def measure(batch: int = 8, iters: int = 12,
            workdir: pathlib.Path = pathlib.Path("/tmp")) -> dict:
    one = run_config(1, batch, iters, workdir)
    two = run_config(2, batch, iters, workdir)
    efficiency = two["global_fps"] / (2 * one["global_fps"])
    return {
        "config": "MPI_15_4 64x64 f32, 1 CPU device/host, "
                  f"local batch {batch}",
        "one_host": one, "two_hosts": two,
        "efficiency_2_hosts": round(efficiency, 4),
        "collectives_inference": collective_census(workdir),
    }


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--iters", type=int, default=12)
    ap.add_argument("--out", default="SCALING_r04.json")
    args = ap.parse_args(argv)
    report = measure(args.batch, args.iters)
    print(json.dumps(report, indent=2))
    if args.out:
        pathlib.Path(args.out).write_text(json.dumps(report, indent=2))
    return 0


if __name__ == "__main__":
    sys.exit(main())
