"""Tutorial 05: multi-camera 3-D triangulation (reference --3d pipeline)."""
import sys

import numpy as np

from openpose_tpu.io.producers import ImageDirectoryReader, ProducerConfig
from openpose_tpu.render.gui3d import render_skeleton_3d
from openpose_tpu.threed.triangulation import reconstruct_array
from openpose_tpu.wrapper import PoseConfig, Wrapper

# Frames are horizontally-stacked views; camera XMLs next to them.
image_dir, camera_dir = sys.argv[1], sys.argv[2]
reader = ImageDirectoryReader(image_dir, ProducerConfig(
    num_views=2, camera_parameter_path=camera_dir))
wrapper = Wrapper(pose=PoseConfig())
for views in reader.frames():
    datums = [wrapper.process(f.image) for f in views]
    cams = np.stack([f.camera.full_matrix for f in views]).astype(np.float32)
    sizes = [(f.image.shape[1], f.image.shape[0]) for f in views]
    kp3d = reconstruct_array([d.pose_keypoints for d in datums], cams, sizes)
    print("3D keypoints:", kp3d.shape)
    render_skeleton_3d(kp3d, wrapper.pose_cfg.model, out_path="skeleton3d.png")
    break
