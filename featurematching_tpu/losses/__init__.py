from featurematching_tpu.losses.loss import (  # noqa: F401
    LossOutput,
    compute_coarse_loss,
    compute_fine_loss,
    compute_pose_loss_new,
    total_loss,
)
