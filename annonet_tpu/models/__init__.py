"""Model abstraction (reference L1): the JAX SegmentationNet replacing the
dlib-dnn-pimpl-wrapper NetPimpl TrainingNet/RuntimeNet pair."""

from annonet_tpu.models.segnet import (
    SegNetConfig,
    apply_runtime,
    apply_train,
    fold_batchnorm,
    init_state,
    recommended_input_dimension,
    required_input_dimension,
)

__all__ = [
    "SegNetConfig",
    "apply_runtime",
    "apply_train",
    "fold_batchnorm",
    "init_state",
    "recommended_input_dimension",
    "required_input_dimension",
]
