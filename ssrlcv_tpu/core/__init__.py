from ssrlcv_tpu.core.types import Cameras, FeatureSet, MatchSet, Bundles
from ssrlcv_tpu.core import camera_math

__all__ = ["Cameras", "FeatureSet", "MatchSet", "Bundles", "camera_math"]
