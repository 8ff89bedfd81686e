"""End-to-end slice test: synthetic dataset -> train -> export -> reload ->
tiled inference -> confusion matrix. This reproduces the reference's de-facto
integration flow (annonet_train then annonet_infer on an anno folder,
SURVEY.md §4) that it never automated — config 1 in BASELINE.json."""

import numpy as np
import pytest

from annonet_tpu import serialization
from annonet_tpu.classes import AnnoClass, anno_classes_to_json, parse_anno_classes
from annonet_tpu.data.codec import labeled_points_by_class
from annonet_tpu.data.crop import CropOptions
from annonet_tpu.data.dataset import ImageFilenames, find_image_files
from annonet_tpu.data.pipeline import CropPipeline
from annonet_tpu.data.sample import read_sample
from annonet_tpu.infer.core import TiledInferer, annonet_infer
from annonet_tpu.infer.evaluation import (
    format_confusion_matrix,
    new_confusion_matrix,
    update_confusion_matrix_per_pixel,
    update_confusion_matrix_per_region,
)
from annonet_tpu.models.segnet import SegNetConfig
from annonet_tpu.train.trainer import Trainer, TrainerConfig

ANNO_CLASSES = [
    AnnoClass(0, (0, 255, 0, 64), "clean"),
    AnnoClass(1, (255, 0, 0, 128), "defect"),
]


def write_synthetic_dataset(root, n_images=4, size=48, seed=0):
    """Trivially separable 2-class data: defect pixels are bright red."""
    from PIL import Image

    rng = np.random.default_rng(seed)
    (root / "anno_classes.json").write_text(anno_classes_to_json(ANNO_CLASSES))
    for i in range(n_images):
        labels = np.zeros((size, size), dtype=np.uint16)
        for _ in range(3):
            y, x = rng.integers(4, size - 10, size=2)
            h, w = rng.integers(4, 8, size=2)
            labels[y : y + h, x : x + w] = 1
        image = np.zeros((size, size, 3), np.uint8)
        noise = rng.integers(0, 40, size=(size, size, 3))
        image[...] = np.where(
            labels[..., None] == 1,
            np.array([220, 30, 30]) + noise - 20,
            np.array([40, 120, 40]) + noise - 20,
        ).clip(0, 255)
        mask = np.zeros((size, size, 4), dtype=np.uint8)
        mask[labels == 0] = ANNO_CLASSES[0].rgba_label
        mask[labels == 1] = ANNO_CLASSES[1].rgba_label
        path = root / f"img{i}.png"
        Image.fromarray(image).save(path)
        Image.fromarray(mask, mode="RGBA").save(
            root / f"img{i}.png_mask.png"
        )


@pytest.mark.slow
def test_train_save_load_infer_round_trip(tmp_path):
    write_synthetic_dataset(tmp_path)

    # --- scan like annonet_train does
    files = find_image_files(str(tmp_path), require_ground_truth=True, verbose=False)
    assert len(files) == 4
    anno_classes_json = (tmp_path / "anno_classes.json").read_text()
    anno_classes = parse_anno_classes(anno_classes_json)

    model_config = SegNetConfig(
        class_count=len(anno_classes),
        level_count=1,
        base_width=8,
        compute_dtype="float32",
    )
    trainer_config = TrainerConfig(initial_learning_rate=0.05)
    trainer = Trainer(model_config, trainer_config, seed=0)
    crop_options = CropOptions(dim=16, allow_flip_left_right=True)

    # deterministic=True: the crop stream is a pure function of (seed,
    # dataset) — without it, 2 racing loader threads interleave
    # nondeterministically and this 40-step trajectory lands anywhere in a
    # band WIDER than the pinned accuracy floors' margin (observed: mIoU
    # 0.8857 under heavy machine load vs 0.936-0.996 recorded)
    with CropPipeline(
        files, anno_classes, crop_options, thread_count=2, seed=1,
        deterministic=True,
    ) as pipe:
        losses = []
        for _ in range(40):
            images, labels = pipe.next_minibatch(8, warn=None)
            losses.append(
                trainer.train_step_crops(images, labels, crop_options)
            )
    assert losses[-1] < losses[0], "loss must decrease on separable data"

    # --- export the self-describing artifact (annonet.dnn analog, §3.4)
    model_path = str(tmp_path / "annonet.dnn.npz")
    serialization.save_model(
        model_path,
        trainer.runtime_net(),
        model_config,
        anno_classes_json,
        downscaling_factor=1.0,
    )

    # --- reload it cold, like annonet_infer_main.cpp:340-351
    params, config, json_back, factor = serialization.load_model(model_path)
    assert json_back == anno_classes_json
    assert factor == 1.0
    classes_back = parse_anno_classes(json_back)
    assert [c.rgba_label for c in classes_back] == [
        c.rgba_label for c in anno_classes
    ]

    # --- tiled inference + both confusion matrices
    inferer = TiledInferer(params, config)
    cm_pixel = new_confusion_matrix(config.class_count)
    cm_region = new_confusion_matrix(config.class_count)
    infer_files = find_image_files(
        str(tmp_path), require_ground_truth=False, verbose=False
    )
    gt_points_total = 0
    for filenames in infer_files:
        sample = read_sample(
            filenames, classes_back, require_ground_truth=False,
            downscaling_factor=factor,
        )
        assert not sample.error
        result = annonet_infer(inferer, sample.input_image)
        assert result.shape == sample.label_image.shape
        gt_points_total += update_confusion_matrix_per_pixel(
            cm_pixel, sample.labeled_points_by_class, result
        )
        update_confusion_matrix_per_region(
            cm_region, sample.labeled_points_by_class,
            sample.label_image, result,
        )

    assert gt_points_total == 4 * 48 * 48
    # accuracy floors pinned by scripts/measure_parity.py (PARITY_TARGETS.json
    # at the repo root): the reference CPU binary cannot be built here (empty
    # submodules, no egress), so the rebuild's measured synthetic-config
    # accuracy is the standing regression target (VERDICT.md item 7)
    import json
    import pathlib

    targets = json.loads(
        (pathlib.Path(__file__).parent.parent / "PARITY_TARGETS.json")
        .read_text()
    )
    accuracy = np.trace(cm_pixel) / cm_pixel.sum()
    assert accuracy >= targets["pinned_pixel_accuracy_floor"], (
        f"pixel accuracy {accuracy:.4f} below pinned floor "
        f"{targets['pinned_pixel_accuracy_floor']}\n"
        + format_confusion_matrix(cm_pixel, classes_back)
    )
    ious = []
    for c in range(config.class_count):
        tp = cm_pixel[c, c]
        denom = cm_pixel[c, :].sum() + cm_pixel[:, c].sum() - tp
        if cm_pixel[c, :].sum() > 0:
            ious.append(tp / max(1, denom))
    miou = sum(ious) / len(ious)
    assert miou >= targets["pinned_miou_floor"], (
        f"mIoU {miou:.4f} below pinned floor {targets['pinned_miou_floor']}"
    )
    assert cm_region.sum() > 0
    # formatted output renders
    assert "accuracy" in format_confusion_matrix(cm_region, classes_back)

    # --- int8 quantized inference (the opt-in 2x-MXU path and bench.py's
    # default) must hold the same pinned accuracy floors on the trained net
    q_inferer = TiledInferer(params, config, quantize="int8")
    cm_q = new_confusion_matrix(config.class_count)
    for filenames in infer_files:
        sample = read_sample(
            filenames, classes_back, require_ground_truth=False,
            downscaling_factor=factor,
        )
        result = annonet_infer(q_inferer, sample.input_image)
        update_confusion_matrix_per_pixel(
            cm_q, sample.labeled_points_by_class, result
        )
    q_accuracy = np.trace(cm_q) / cm_q.sum()
    assert q_accuracy >= targets["pinned_pixel_accuracy_floor"], (
        f"int8 pixel accuracy {q_accuracy:.4f} below pinned floor "
        f"{targets['pinned_pixel_accuracy_floor']}"
    )
