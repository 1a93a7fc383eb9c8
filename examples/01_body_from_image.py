"""Tutorial 01: body keypoints from one image (reference tutorial
examples/tutorial_api_python/01_body_from_image.py equivalent)."""
import sys

import cv2

from openpose_tpu.wrapper import PoseConfig, Wrapper

image_path = sys.argv[1] if len(sys.argv) > 1 else "image.jpg"
image = cv2.imread(image_path)
wrapper = Wrapper(pose=PoseConfig())  # add caffemodel="weights.npz" for real weights
datum = wrapper.process(image)
print("Body keypoints:\n", datum.pose_keypoints)
cv2.imwrite("rendered.png", wrapper.render(datum))
