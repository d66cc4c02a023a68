from . import colorspace, cost_volume, disparity, preprocess, soft_argmin, upsample
