"""Tutorial 04: asynchronous video processing with the host pipeline."""
import sys

from openpose_tpu.io.producers import VideoReader
from openpose_tpu.runtime.pipeline import AsyncPipeline
from openpose_tpu.wrapper import PoseConfig, Wrapper

wrapper = Wrapper(pose=PoseConfig())
reader = VideoReader(sys.argv[1] if len(sys.argv) > 1 else "video.avi")
results = []
pipe = AsyncPipeline(
    reader.frames(),
    process=lambda views: wrapper.process(views[0].image,
                                          views[0].frame_id),
    consumer=lambda d: results.append(d.pose_keypoints),
    in_flight=2)
stats = pipe.run()
print(f"{stats.frames} frames at {stats.fps:.2f} fps")
