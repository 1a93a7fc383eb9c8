"""Tutorial 02: body + face + hands (reference tutorial 06/07 equivalents)."""
import sys

import cv2

from openpose_tpu.wrapper import FaceConfig, HandConfig, PoseConfig, Wrapper

image = cv2.imread(sys.argv[1] if len(sys.argv) > 1 else "image.jpg")
wrapper = Wrapper(pose=PoseConfig(), face=FaceConfig(enable=True),
                  hand=HandConfig(enable=True))
datum = wrapper.process(image)
print("pose:", None if datum.pose_keypoints is None else datum.pose_keypoints.shape)
print("face:", None if datum.face_keypoints is None else datum.face_keypoints.shape)
print("hands:", None if datum.hand_left_keypoints is None else
      (datum.hand_left_keypoints.shape, datum.hand_right_keypoints.shape))
cv2.imwrite("rendered_whole_body.png", wrapper.render(datum))
