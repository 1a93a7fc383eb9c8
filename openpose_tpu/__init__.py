"""openpose_tpu: TPU-native multi-person pose estimation (OpenPose capabilities, JAX/XLA/Pallas)."""

__version__ = "0.1.0"
