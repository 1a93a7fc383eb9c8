"""Parameter checkpointing: native .npz format + caffemodel import.

The reference's "checkpoints" are the pretrained caffemodels downloaded at
build time (CMakeLists.txt:304-346, SURVEY §5.4).  Here:

* `save / load` — the framework-native format (single .npz, layer-name keys);
* `convert_caffemodel` — one-shot import of an original OpenPose
  .caffemodel into the native format (the getModels.sh replacement for
  users migrating from the reference).
"""

from __future__ import annotations

import pathlib
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from openpose_tpu.models import caffe_proto, graph


def save(path: str, params: graph.Params) -> None:
    flat = {}
    for layer, sub in params.items():
        for key, val in sub.items():
            flat[f"{layer}/{key}"] = np.asarray(val)
    pathlib.Path(path).parent.mkdir(parents=True, exist_ok=True)
    np.savez(path, **flat)


def load(path: str, dtype=jnp.float32) -> graph.Params:
    data = np.load(path)
    params: graph.Params = {}
    for full_key in data.files:
        layer, key = full_key.rsplit("/", 1)
        params.setdefault(layer, {})[key] = jnp.asarray(data[full_key], dtype)
    return params


def convert_caffemodel(caffemodel_path: str, spec_name: str,
                       out_path: Optional[str] = None) -> graph.Params:
    """Convert an original .caffemodel; optionally persist as .npz."""
    spec = graph.load_spec(spec_name)
    blobs = caffe_proto.parse_caffemodel(
        pathlib.Path(caffemodel_path).read_bytes())
    params = graph.convert_caffe_blobs(spec, blobs)
    if out_path:
        save(out_path, params)
    return params
