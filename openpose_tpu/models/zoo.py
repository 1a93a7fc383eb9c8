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


# Conventional model-folder layout of the reference (getPoseTrainedModel /
# getFaceModel etc., src/openpose/pose/poseParameters.cpp:394-408): relative
# caffemodel paths under `--model_folder`.
CAFFEMODEL_PATHS = {
    PoseModel.BODY_25: "pose/body_25/pose_iter_584000.caffemodel",
    PoseModel.COCO_18: "pose/coco/pose_iter_440000.caffemodel",
    PoseModel.MPI_15: "pose/mpi/pose_iter_160000.caffemodel",
    PoseModel.MPI_15_4: "pose/mpi/pose_iter_160000.caffemodel",
}
FACE_CAFFEMODEL_PATH = "face/pose_iter_116000.caffemodel"
HAND_CAFFEMODEL_PATH = "hand/pose_iter_102000.caffemodel"


def resolve_caffemodel(caffemodel: Optional[str],
                       model_folder: Optional[str],
                       relative: str) -> Optional[str]:
    """Explicit `--caffemodel_path` wins; else look in the conventional
    `--model_folder` layout; else None (random init)."""
    if caffemodel:
        return caffemodel
    if model_folder:
        candidate = pathlib.Path(model_folder) / relative
        if candidate.exists():
            return str(candidate)
    return None


def _load(spec_name: str, caffemodel: Optional[str], seed: int,
          prototxt: Optional[str] = None) -> Model:
    if prototxt is not None:
        spec = caffe_proto.parse_prototxt(
            pathlib.Path(prototxt).read_text())
    else:
        spec = graph.load_spec(spec_name)
    if caffemodel is not None:
        blobs = caffe_proto.parse_caffemodel(pathlib.Path(caffemodel).read_bytes())
        params = graph.convert_caffe_blobs(spec, blobs)
    else:
        params = graph.init_params(spec, jax.random.PRNGKey(seed))
    return Model(spec=spec, params=params)


def load_pose_model(model: PoseModel = PoseModel.BODY_25,
                    caffemodel: Optional[str] = None, seed: int = 0,
                    model_folder: Optional[str] = None,
                    prototxt: Optional[str] = None) -> Model:
    if model.experimental:
        # The reference's experimental enum values carry placeholder model
        # paths and ship no weights (poseParameters.cpp:377-391); match
        # that surface with a clear error instead of a KeyError.
        raise ValueError(
            f"PoseModel.{model.name} is one of the reference's experimental "
            "topologies with no published weights or deploy prototxt; load "
            "a custom topology with prototxt=/--prototxt_path instead")
    info = POSE_MODEL_INFO[model]
    caffemodel = resolve_caffemodel(caffemodel, model_folder,
                                    CAFFEMODEL_PATHS.get(model, ""))
    m = _load(info.spec, caffemodel, seed, prototxt)
    m.info = info
    return m


def load_face_model(caffemodel: Optional[str] = None, seed: int = 1,
                    model_folder: Optional[str] = None) -> Model:
    caffemodel = resolve_caffemodel(caffemodel, model_folder,
                                    FACE_CAFFEMODEL_PATH)
    return _load("face_70", caffemodel, seed)


def load_hand_model(caffemodel: Optional[str] = None, seed: int = 2,
                    model_folder: Optional[str] = None) -> Model:
    caffemodel = resolve_caffemodel(caffemodel, model_folder,
                                    HAND_CAFFEMODEL_PATH)
    return _load("hand_21", caffemodel, seed)
