"""Matching stages as pure functions over fixed-shape arrays."""

from featurematching_tpu.matching.coarse import (  # noqa: F401
    CoarseMatches,
    coarse_match,
    dual_softmax_confidence,
)
from featurematching_tpu.matching.fine import (  # noqa: F401
    FineMatches,
    gather_fine_windows,
    fine_soft_argmax,
)
