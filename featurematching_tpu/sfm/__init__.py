"""SfM back-end: triangulation, Schur-complement bundle adjustment, pose-graph
optimization — new capability beyond the reference matcher (BASELINE.json
configs 4-5), built on the geometry layer.

Everything is fixed-shape: observations are padded (cam_idx, pt_idx, uv, mask)
arrays, so the whole solver jits once and runs for any subset of a scene. The
observation axis is embarrassingly data-parallel: `distributed/` shards it
over the device mesh and psums the reduced camera system (the TPU-native form
of "partition keyframes/map blocks per host").
"""

from featurematching_tpu.sfm.ba import (  # noqa: F401
    BAProblem,
    BAResult,
    bundle_adjust,
    reprojection_residuals,
)
from featurematching_tpu.sfm.pose_graph import (  # noqa: F401
    PoseGraph,
    optimize_pose_graph,
)
from featurematching_tpu.sfm.windowed import (  # noqa: F401
    OdometryResult,
    run_sequence_windowed,
    run_sequence_windowed_full,
)
from featurematching_tpu.sfm.loop_closure import (  # noqa: F401
    LoopDetector,
    LoopEdge,
    close_loops,
    detect_loop_edges,
    feature_descriptor,
    image_descriptor,
    run_sequence_loop_closed,
)
