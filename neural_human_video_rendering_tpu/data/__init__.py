from . import keypoints, rasterize, pose_align, densepose, laplace, dataset  # noqa: F401
