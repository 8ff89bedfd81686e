"""Compute-path ops (reference L0 equivalents): loss weighting, weighted
per-pixel cross-entropy, tile blending, connected components."""

from annonet_tpu.ops.loss import weighted_pixel_cross_entropy
from annonet_tpu.ops.weighting import batched_label_weights, set_weights

__all__ = [
    "batched_label_weights",
    "set_weights",
    "weighted_pixel_cross_entropy",
]
