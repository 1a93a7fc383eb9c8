"""Tutorial 08: hand keypoints from user-supplied hand rectangles, body
disabled (reference python tutorial 07_hand_from_image.py: handRectangles
passed in as [left, right] pairs, --body 0 --hand).
"""
import sys

import cv2
import jax.numpy as jnp

from openpose_tpu.hand.extractor import HandExtractor
from openpose_tpu.models import zoo
from openpose_tpu.render.render import render_hands

image = cv2.imread(sys.argv[1] if len(sys.argv) > 1 else "image.jpg")

# One (left, right) rectangle pair per person, (x, y, width, height);
# a zero-size rectangle skips that hand (like the reference's empty Rect).
hand_rectangles = [
    ((320.0, 377.0, 70.0, 70.0),      # person 0 left hand
     (80.0, 407.0, 80.0, 80.0)),      # person 0 right hand
    ((0.0, 0.0, 0.0, 0.0),            # person 1: left hand not visible
     (190.0, 80.0, 100.0, 100.0)),
]

extractor = HandExtractor(zoo.load_hand_model(), compute_dtype=jnp.float32)
left, right = extractor.forward(image.astype("float32"), hand_rectangles)
print("left hands:", left.shape, " right hands:", right.shape)
cv2.imwrite("rendered_hands.png", render_hands(image.copy(), left, right))
