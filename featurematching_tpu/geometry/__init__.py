"""Pure-JAX geometry: SE(3), epipolar, cameras, robust estimation.

No learned parameters; every function is fixed-shape and vmap/jit friendly.
Replaces the reference's mix of scipy/OpenCV/kornia CPU geometry
(/root/reference/network/utils/pose_pred.py:59-151, utils/metrics.py:33-109).
"""

from featurematching_tpu.geometry.se3 import (  # noqa: F401
    axis_angle_to_matrix,
    matrix_to_euler_zyx,
    euler_zyx_to_matrix,
    quat_to_matrix,
    matrix_to_quat,
    transform_from_params,
    invert_se3,
    relative_pose_error,
    so3_exp,
    so3_log,
    se3_exp,
    se3_log,
)
from featurematching_tpu.geometry.epipolar import (  # noqa: F401
    cross_product_matrix,
    essential_from_pose,
    symmetric_epipolar_distance,
    sampson_distance,
    normalize_keypoints,
)
from featurematching_tpu.geometry.ransac import (  # noqa: F401
    estimate_essential_ransac,
    decompose_essential,
    recover_pose_from_essential,
)
from featurematching_tpu.geometry.triangulation import (  # noqa: F401
    triangulate_linear,
)
