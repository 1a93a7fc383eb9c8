#!/usr/bin/env python3
"""Calibrate the timing methodology on the axon tunnel: identical repeated
calls vs distinct inputs, block_until_ready vs host readback."""
import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import numpy as np
import jax
import jax.numpy as jnp
from openpose_tpu.models import graph, zoo
from openpose_tpu.params import PoseModel


def main():
    model = zoo.load_pose_model(PoseModel.BODY_25)
    net_h, net_w = 368, 656
    batch = 8
    fwd = jax.jit(lambda p, x: graph.forward(p, model.spec, x, jnp.bfloat16))

    rng = np.random.RandomState(0)
    imgs = [jnp.asarray(rng.uniform(-0.5, 0.5, (batch, net_h, net_w, 3))
                        .astype(np.float32)) for _ in range(8)]
    out = fwd(model.params, imgs[0])
    jax.block_until_ready(out)

    n = 16
    # 1) identical input, block_until_ready
    t0 = time.perf_counter()
    for _ in range(n):
        out = fwd(model.params, imgs[0])
    jax.block_until_ready(out)
    t_same = (time.perf_counter() - t0) / n * 1000

    # 2) distinct inputs, block_until_ready at end
    t0 = time.perf_counter()
    for i in range(n):
        out = fwd(model.params, imgs[i % len(imgs)])
    jax.block_until_ready(out)
    t_diff = (time.perf_counter() - t0) / n * 1000

    # 3) distinct inputs, block every call
    t0 = time.perf_counter()
    for i in range(n):
        jax.block_until_ready(fwd(model.params, imgs[i % len(imgs)]))
    t_diff_blk = (time.perf_counter() - t0) / n * 1000

    # 4) distinct inputs, host readback every call
    t0 = time.perf_counter()
    for i in range(n):
        out = fwd(model.params, imgs[i % len(imgs)])
        _ = np.asarray(out[0, 0, 0, :4])
    t_read = (time.perf_counter() - t0) / n * 1000

    print(f"same input, block at end      {t_same:8.2f} ms")
    print(f"distinct inputs, block at end {t_diff:8.2f} ms")
    print(f"distinct inputs, block each   {t_diff_blk:8.2f} ms")
    print(f"distinct inputs, readback     {t_read:8.2f} ms")


if __name__ == "__main__":
    main()
