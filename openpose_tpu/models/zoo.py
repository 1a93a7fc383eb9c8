"""Model registry: pose / face / hand nets with init or caffemodel weights.

Reference model table: src/openpose/pose/poseParameters.cpp:377-391 (prototxt
paths), :552-575 (caffemodel paths).  Here a model is (NetSpec, Params) plus
its PoseModelInfo; weights come from either random init (for benchmarking /
training-from-scratch) or a converted .caffemodel.
"""

from __future__ import annotations

import dataclasses
import pathlib
from typing import Optional

import jax
import jax.numpy as jnp

from openpose_tpu.models import caffe_proto, graph
from openpose_tpu.params import PoseModel, POSE_MODEL_INFO, PoseModelInfo


@dataclasses.dataclass
class Model:
    spec: caffe_proto.NetSpec
    params: graph.Params
    info: Optional[PoseModelInfo] = None  # None for face/hand nets

    def forward(self, image: jax.Array, compute_dtype=jnp.bfloat16) -> jax.Array:
        return graph.forward(self.params, self.spec, image, compute_dtype)


def _load(spec_name: str, caffemodel: Optional[str], seed: int) -> Model:
    spec = graph.load_spec(spec_name)
    if caffemodel is not None:
        blobs = caffe_proto.parse_caffemodel(pathlib.Path(caffemodel).read_bytes())
        params = graph.convert_caffe_blobs(spec, blobs)
    else:
        params = graph.init_params(spec, jax.random.PRNGKey(seed))
    return Model(spec=spec, params=params)


def load_pose_model(model: PoseModel = PoseModel.BODY_25,
                    caffemodel: Optional[str] = None, seed: int = 0) -> Model:
    info = POSE_MODEL_INFO[model]
    m = _load(info.spec, caffemodel, seed)
    m.info = info
    return m


def load_face_model(caffemodel: Optional[str] = None, seed: int = 1) -> Model:
    return _load("face_70", caffemodel, seed)


def load_hand_model(caffemodel: Optional[str] = None, seed: int = 2) -> Model:
    return _load("hand_21", caffemodel, seed)
