"""Input pipelines: synthetic batches, dataset readers, pseudo-GT caches."""

from featurematching_tpu.data.synthetic import synthetic_batch  # noqa: F401
