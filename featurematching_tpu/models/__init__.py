"""Flax (linen) model components: backbones, LoFTR transformers, matcher."""

from featurematching_tpu.models.transformer import (  # noqa: F401
    EncoderLayer,
    LocalFeatureTransformer,
)
from featurematching_tpu.models.matcher import Matcher, MatcherOutput  # noqa: F401
