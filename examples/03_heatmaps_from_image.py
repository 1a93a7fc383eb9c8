"""Tutorial 03: access + visualize network heatmaps (reference tutorials
04_keypoints_from_images / 09_keypoints_from_heatmaps equivalents)."""
import sys

import cv2

from openpose_tpu.render import heatmaps as hm
from openpose_tpu.wrapper import PoseConfig, Wrapper

image = cv2.imread(sys.argv[1] if len(sys.argv) > 1 else "image.jpg")
wrapper = Wrapper(pose=PoseConfig())
pred = wrapper.pose_extractor.forward(image, keep_heatmaps=True)
print("heatmaps:", pred.heatmaps.shape)  # [H, W, parts] merged, net scale
overlay = hm.overlay_heatmap(image.copy(), pred.heatmaps, part=-1)
cv2.imwrite("heatmaps.png", overlay)
