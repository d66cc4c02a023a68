from .stereonet import StereoNet, create_stereonet, init_params
from .fast_stereonet import FastStereoNet
