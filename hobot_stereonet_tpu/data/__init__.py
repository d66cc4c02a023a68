from . import kitti, kitti_odometry, loader, sceneflow, stream, synthetic
