"""annonet_tpu — a TPU-native (JAX/XLA/Pallas) semantic-segmentation framework.

A from-scratch rebuild of the capabilities of reunanen/annonet (a C++17/dlib
toolkit for training and applying semantic-segmentation CNNs on images
annotated with the "anno" labeling tool), redesigned for TPU hardware:

  * the DNN engine is JAX/XLA (NHWC, bfloat16 on the MXU) instead of
    dlib/cuDNN (reference L0, see /root/reference vcxproj file lists);
  * the model abstraction (`annonet_tpu.models.SegmentationNet`) replaces the
    dlib-dnn-pimpl-wrapper TrainingNet/RuntimeNet pair (reference L1);
  * tiled large-image inference is batched XLA execution with on-device
    overlap blending (reference `annonet_infer.cpp`);
  * data parallelism is a `jax.sharding.Mesh` + shard_map gradient-psum
    (the reference is single-device; see SURVEY.md §2.3).

Public layering mirrors the reference's five layers (SURVEY.md §1):
  L0 engine          -> jax/XLA/pallas (annonet_tpu.ops)
  L1 model           -> annonet_tpu.models
  L2 data layer      -> annonet_tpu.data, annonet_tpu.classes
  L3 train/infer lib -> annonet_tpu.train, annonet_tpu.infer
  L4 CLI             -> annonet_tpu.cli (annonet_train / annonet_infer)
"""

from annonet_tpu.classes import (
    AnnoClass,
    IGNORE_LABEL,
    RGBA_IGNORE,
    default_anno_classes,
    parse_anno_classes,
)

__version__ = "0.1.0"


def __getattr__(name):
    """Lazy top-level exports of the heavyweight (jax-importing) API."""
    if name in ("SegNetConfig",):
        from annonet_tpu.models.segnet import SegNetConfig

        return SegNetConfig
    if name in ("Trainer", "TrainerConfig"):
        from annonet_tpu.train import trainer

        return getattr(trainer, name)
    if name in ("TiledInferer", "annonet_infer"):
        from annonet_tpu.infer import core

        return getattr(core, name)
    if name in ("save_model", "load_model"):
        from annonet_tpu import serialization

        return getattr(serialization, name)
    if name in ("ServeClient", "ServeError"):
        # jax-free: talks to an annonet_serve sidecar over HTTP
        from annonet_tpu import client

        return getattr(client, name)
    raise AttributeError(f"module 'annonet_tpu' has no attribute {name!r}")


__all__ = [
    "AnnoClass",
    "IGNORE_LABEL",
    "RGBA_IGNORE",
    "SegNetConfig",
    "ServeClient",
    "ServeError",
    "TiledInferer",
    "Trainer",
    "TrainerConfig",
    "annonet_infer",
    "default_anno_classes",
    "load_model",
    "parse_anno_classes",
    "save_model",
    "__version__",
]
