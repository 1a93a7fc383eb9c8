#!/usr/bin/env python3
"""Device-only train-step timing (chained; tunnel-proof).

The train loop's steady-state img/s through the remote tunnel bundles the
per-step host->device upload (~6 MB uint8 at 368x656 batch 8) with compute;
this probe chains N data-dependent train steps inside one jit on FIXED
device-resident data, so it reports the pure device step time — the number
a co-located host would see — and the training MFU against the 3x-forward
FLOPs convention.

Run:  python scripts/profile_train_step.py [--image_size 368x656] [--batch 8]
"""

import argparse
import json
import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--image_size", default="368x656", help="HxW")
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args(argv)
    if args.cpu:
        import jax
        jax.config.update("jax_platforms", "cpu")
    from openpose_tpu.utils.compile_cache import enable_persistent_cache
    enable_persistent_cache()

    import jax
    import jax.numpy as jnp
    import numpy as np
    import optax
    from openpose_tpu import train as train_mod
    from openpose_tpu.models import graph
    from openpose_tpu.ops import paf as paf_ops
    from openpose_tpu.ops.resize import normalize_vgg
    from openpose_tpu.params import POSE_MODEL_INFO, PoseModel
    from openpose_tpu.utils.benchmark import bf16_peak_tflops, chain_ms

    h, w = (int(v) for v in args.image_size.split("x"))
    info = POSE_MODEL_INFO[PoseModel.BODY_25]
    spec = graph.load_spec(info.spec)
    optimizer = optax.adam(1e-4)
    state = train_mod.init_train_state(spec, optimizer,
                                       jax.random.PRNGKey(0))
    pairs = jnp.asarray(paf_ops.pair_tables(info)[0])
    map_idx = jnp.asarray(paf_ops.pair_tables(info)[1])
    base_step = train_mod.make_train_step(spec, optimizer)

    rng = np.random.RandomState(0)
    images = jnp.asarray(rng.randint(
        0, 255, (args.batch, h, w, 3)).astype(np.uint8))
    kp = np.zeros((args.batch, 3, info.num_parts, 3), np.float32)
    kp[..., 0] = rng.uniform(40, w - 40, kp.shape[:-1])
    kp[..., 1] = rng.uniform(40, h - 40, kp.shape[:-1])
    kp[..., 2] = 1.0
    keypoints = jnp.asarray(kp)

    # The chain threads the carry through the IMAGE (so steps serialize);
    # every iteration intentionally reuses the initial optimizer state —
    # identical FLOPs/memory to the real step.
    def step(c):
        targets = train_mod.make_targets(
            keypoints, pairs, map_idx, (h, w), info.num_parts,
            info.heatmap_channels)
        x = normalize_vgg(images.astype(jnp.float32) + c * 1e-12)
        _new_state, loss = base_step(state, x, targets)
        return c + loss * 1e-12

    ms = chain_ms(step, n_lo=2, n_hi=10)
    fwd_gflops = sum(graph.count_flops(spec, (h, w)).values()) / 1e9
    img_s = args.batch / ms * 1000.0
    tflops = 3.0 * fwd_gflops * img_s / 1e3
    peak = bf16_peak_tflops()
    out = {
        "image_size": f"{h}x{w}", "batch": args.batch,
        "device_step_ms": round(ms, 2),
        "device_img_s": round(img_s, 1),
        "fwd_gflops_img": round(fwd_gflops, 1),
        "train_tflops": round(tflops, 1),
        "train_mfu": round(tflops / peak, 3) if peak else None,
        "device_kind": jax.devices()[0].device_kind,
    }
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    sys.exit(main())
