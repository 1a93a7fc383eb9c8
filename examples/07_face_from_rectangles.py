"""Tutorial 07: face keypoints from user-supplied face rectangles, body
disabled (reference python tutorial 06_face_from_image.py: faceRectangles
passed in, --body 0 --face).
"""
import sys

import cv2
import jax.numpy as jnp

from openpose_tpu.face.extractor import FaceExtractor
from openpose_tpu.models import zoo
from openpose_tpu.render.render import render_face

image = cv2.imread(sys.argv[1] if len(sys.argv) > 1 else "image.jpg")

# (x, y, width, height) boxes, e.g. from an external face detector
face_rectangles = [
    (330.0, 77.0, 153.0, 153.0),
    (24.0, 267.0, 165.0, 165.0),
]

extractor = FaceExtractor(zoo.load_face_model(), compute_dtype=jnp.float32)
face_keypoints = extractor.forward(image.astype("float32"), face_rectangles)
print("face keypoints:", face_keypoints.shape)   # [n_faces, 70, 3]
cv2.imwrite("rendered_faces.png", render_face(image.copy(), face_keypoints))
