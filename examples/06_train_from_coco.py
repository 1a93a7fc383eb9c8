"""Tutorial 06: train the BODY_25 CNN on COCO keypoints (beyond the
reference, which defers training to the separate openpose_train repo)."""
import sys

from openpose_tpu.train_loop import TrainConfig, coco_data_iterator, train

images_dir, annotations = sys.argv[1], sys.argv[2]
config = TrainConfig(steps=1000, batch_size=8)
data = coco_data_iterator(images_dir, annotations, config)
train(config, data)
