"""TPU-native op layer: equivalents of the reference's cuda/ extension zoo.

Every op ships a pure-XLA implementation with a custom VJP mirroring the
reference CUDA backward formulas; Pallas kernels (sparenet_tpu.ops.pallas)
accelerate the hot ones with identical semantics.
"""

from .chamfer import (
    chamfer_raw,
    chamfer_distance,
    chamfer_distance_mean,
    chamfer_distance_separate,
    nn_search,
)
from .knn import knn_idx, get_graph_feature
from .emd import emd_auction, emd_loss
from .mds import minimum_density_sample, gather_points
from .expansion_penalty import expansion_penalty
from .gridding import gridding, gridding_reverse
from .gridding_loss import gridding_distance, gridding_loss, GriddingLoss
from .cubic_feature_sampling import cubic_feature_sampling
from .p2i import p2i, p2i_sum, p2i_max

__all__ = [
    "chamfer_raw", "chamfer_distance", "chamfer_distance_mean",
    "chamfer_distance_separate", "nn_search",
    "knn_idx", "get_graph_feature",
    "emd_auction", "emd_loss",
    "minimum_density_sample", "gather_points",
    "expansion_penalty",
    "gridding", "gridding_reverse",
    "gridding_distance", "gridding_loss", "GriddingLoss",
    "cubic_feature_sampling",
    "p2i", "p2i_sum", "p2i_max",
]
