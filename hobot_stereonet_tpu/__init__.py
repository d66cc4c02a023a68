"""TPU-native stereo depth + mapping framework.

From-scratch JAX/XLA/Pallas reimplementation of the capabilities of
D-Robotics ``hobot_stereonet`` (ROS2/BPU StereoNet deployment), redesigned
for TPU: the full StereoNet pipeline as device code, a streaming inference
engine, GSPMD batch/tile scale-out, and a stereo SLAM back end with
distributed bundle adjustment.  See SURVEY.md for the reference analysis.
"""

from .config import (
    CameraConfig,
    Config,
    EngineConfig,
    MeshConfig,
    PreprocessConfig,
    SLAMConfig,
    StereoNetConfig,
)

__version__ = "0.1.0"
