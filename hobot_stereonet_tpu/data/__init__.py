from . import kitti, loader, sceneflow, stream, synthetic
