"""Multi-host (multi-process) batch inference.

``annonet_infer --coordinator`` shards the IMAGE LIST across processes
(process i takes images i, i+P, ... of the deterministic
find_image_files order) — the embarrassingly-parallel axis for batch
inference over a directory, pairing ``annonet_train --coordinator``.
Each process runs its own shard's tiled inference and writes its own
``_result.png`` files; confusion matrices and timing aggregates are
all-gathered at the end (the gather doubles as the exit barrier) and
process 0 prints the merged report / writes --report-json.

These tests spawn real subprocesses (each needs its own JAX runtime,
collectives over gloo/TCP on CPU) and compare the merged results with a
single-process run of the same directory.
"""

import json
import os
import subprocess
import sys

import numpy as np
import pytest

from tests.test_end_to_end import write_synthetic_dataset
from tests.test_multihost import _env, _free_port

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _write_model(path, classes_json):
    import jax

    from annonet_tpu import serialization
    from annonet_tpu.models.segnet import (
        SegNetConfig, fold_batchnorm, init_state,
    )

    config = SegNetConfig(class_count=2, level_count=0, base_width=16)
    params, bn = init_state(jax.random.PRNGKey(3), config)
    runtime = fold_batchnorm(params, bn, config)
    serialization.save_model(str(path), runtime, config, classes_json, 1.0)


def _infer_cmd(data_dir, model_path, report_path, extra=()):
    return [
        sys.executable, "-m", "annonet_tpu.cli.infer",
        str(data_dir),
        "--model", str(model_path),
        "--tile-max-width", "64", "--tile-max-height", "64",
        "--full-image-reader-thread-count", "2",
        "--result-image-writer-thread-count", "2",
        "--report-json", str(report_path),
        *extra,
    ]


@pytest.fixture(scope="module")
def shard_setup(tmp_path_factory):
    root = tmp_path_factory.mktemp("mhinfer")
    data_single = root / "data_single"
    data_multi = root / "data_multi"
    for d in (data_single, data_multi):
        d.mkdir()
        # 5 images: an ODD count so the 2-process shards are uneven (3+2)
        write_synthetic_dataset(d, n_images=5, size=48, seed=11)
    model = root / "annonet.dnn"
    _write_model(model, (data_single / "anno_classes.json").read_text())

    # single-process reference arm
    report_single = root / "report_single.json"
    proc = subprocess.run(
        _infer_cmd(data_single, model, report_single),
        env=_env(1), capture_output=True, text=True, timeout=600,
    )
    assert proc.returncode == 0, proc.stdout + proc.stderr

    # 2-process --coordinator arm on an identical COPY of the dataset (so
    # result PNGs cannot leak between arms)
    port = _free_port()
    reports = [root / f"report_p{i}.json" for i in range(2)]
    procs = [
        subprocess.Popen(
            _infer_cmd(
                data_multi, model, reports[pid],
                extra=[
                    "--coordinator", f"127.0.0.1:{port}",
                    "--num-processes", "2",
                    "--process-id", str(pid),
                ],
            ),
            env=_env(1), stdout=subprocess.PIPE,
            stderr=subprocess.STDOUT, text=True,
        )
        for pid in range(2)
    ]
    logs = []
    try:
        for p in procs:
            out, _ = p.communicate(timeout=600)
            logs.append(out)
    finally:
        for p in procs:
            if p.poll() is None:
                p.kill()
    assert [p.returncode for p in procs] == [0, 0], "\n===\n".join(logs)
    return {
        "data_single": data_single,
        "data_multi": data_multi,
        "report_single": report_single,
        "reports": reports,
        "logs": logs,
    }


def test_two_process_run_matches_single_process(shard_setup):
    single = json.loads(shard_setup["report_single"].read_text())
    merged = json.loads(shard_setup["reports"][0].read_text())

    assert merged["images"] == single["images"] == 5
    assert merged["processes"] == 2
    # the merged confusion matrices equal the single-process run exactly
    for key in ("confusion_per_pixel", "confusion_per_region"):
        assert merged[key]["matrix"] == single[key]["matrix"], key
        assert merged[key]["accuracy"] == single[key]["accuracy"], key
    # per-image records cover only process 0's shard (documented)
    assert len(merged["per_image"]) == 3


def test_result_pngs_identical_across_arms(shard_setup):
    from PIL import Image

    for i in range(5):
        a = shard_setup["data_single"] / f"img{i}.png_result.png"
        b = shard_setup["data_multi"] / f"img{i}.png_result.png"
        assert a.exists() and b.exists(), (a, b)
        with Image.open(a) as im_a, Image.open(b) as im_b:
            np.testing.assert_array_equal(
                np.asarray(im_a.convert("RGBA")),
                np.asarray(im_b.convert("RGBA")),
            )


def test_rank_roles(shard_setup):
    log0, log1 = shard_setup["logs"]
    assert "Multi-host inference: process 0 of 2" in log0
    assert "Multi-host inference: process 1 of 2" in log1
    # only process 0 prints the merged matrices and writes the report
    assert "Confusion matrix per pixel" in log0
    assert "Confusion matrix per pixel" not in log1
    assert not shard_setup["reports"][1].exists()
    # each rank infers its own shard
    assert "this process infers 3" in log0
    assert "this process infers 2" in log1


def test_mesh_does_not_compose_with_coordinator(tmp_path):
    write_synthetic_dataset(tmp_path, n_images=1, size=48, seed=0)
    model = tmp_path / "annonet.dnn"
    _write_model(model, (tmp_path / "anno_classes.json").read_text())
    proc = subprocess.run(
        _infer_cmd(tmp_path, model, tmp_path / "r.json",
                   extra=["--coordinator", "127.0.0.1:1", "--mesh", "2",
                          "--num-processes", "1", "--process-id", "0"]),
        env=_env(1), capture_output=True, text=True, timeout=120,
    )
    assert proc.returncode == 1
    assert "does not compose with --mesh" in proc.stdout
