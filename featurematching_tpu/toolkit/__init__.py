"""SCARED toolkit: offline dense-geometry conversions, io, calibration, eval.

Host-CPU L0 tooling with the capabilities of
/root/reference/datasets/scared_toolkits/scaredtk/ (conversions, io,
calibrator, evaluation) and its CLI scripts. Pure numpy + OpenCV; none of
this runs on the TPU compute path.
"""

from featurematching_tpu.toolkit import conversions, evaluation, io  # noqa: F401
