from . import euroc, kitti, kitti_odometry, loader, sceneflow, stream, synthetic
