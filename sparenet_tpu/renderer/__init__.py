from .depth_maps import (
    ComputeDepthMaps,
    N_VIEWS_PREDEFINED,
    look_at,
    orthorgonal,
    perspective,
    transform_points,
)

__all__ = [
    "ComputeDepthMaps", "N_VIEWS_PREDEFINED", "look_at", "orthorgonal",
    "perspective", "transform_points",
]
