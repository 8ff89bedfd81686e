"""Model and trainer-state serialization.

The deployable artifact keeps the reference's self-describing contract
(annonet_train_main.cpp:557-565, annonet_infer_main.cpp:340-351): ONE file —
by convention still named ``annonet.dnn`` — containing

  1. the raw anno_classes.json string,
  2. the combined downscaling factor (initial * further),
  3. the inference (BN-folded) network,

so the class palette, scale, and weights travel together and inference needs
no side files (SURVEY.md §3.4 calls this the compatibility contract).

Container format: NumPy .npz (zip) with a JSON metadata entry plus one array
per parameter leaf, keyed by its pytree path. No pickle — the file is
portable and safe to load.

The trainer synchronization file (annonet_trainer_state_file.dat in the
reference, written every 10 minutes via SetSynchronizationFile,
annonet_train_main.cpp:403) uses the same container with a different
metadata schema and holds the FULL training state: params, BN stats,
optimizer momentum, learning rate, step, and the recent-loss window, so a
restarted run resumes exactly.
"""

from __future__ import annotations

import json
import os
import tempfile
from typing import Any, Dict, Tuple

import numpy as np

from annonet_tpu.models.segnet import SegNetConfig

_FORMAT = "annonet-tpu-npz-v1"
_SEP = "/"


def flatten_tree(tree: Any, prefix: str = "") -> Dict[str, np.ndarray]:
    """Flatten a nested dict-of-arrays pytree into {path: array}."""
    out: Dict[str, np.ndarray] = {}
    if isinstance(tree, dict):
        for k, v in tree.items():
            key = f"{prefix}{_SEP}{k}" if prefix else str(k)
            out.update(flatten_tree(v, key))
    else:
        out[prefix] = np.asarray(tree)
    return out


def unflatten_tree(flat: Dict[str, np.ndarray]) -> Any:
    """Inverse of flatten_tree."""
    root: Dict[str, Any] = {}
    for path, value in flat.items():
        parts = path.split(_SEP)
        node = root
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = value
    return root


def _atomic_savez(path: str, **arrays) -> None:
    """Write an npz atomically (the sync file may be overwritten while a
    previous copy is being read by a resuming process)."""
    directory = os.path.dirname(os.path.abspath(path)) or "."
    fd, tmp = tempfile.mkstemp(dir=directory, suffix=".tmp")
    try:
        with os.fdopen(fd, "wb") as f:
            np.savez(f, **arrays)
        os.replace(tmp, path)
    except BaseException:
        if os.path.exists(tmp):
            os.unlink(tmp)
        raise


def save_model(
    path: str,
    runtime_params: Any,
    config: SegNetConfig,
    anno_classes_json: str,
    downscaling_factor: float,
) -> None:
    """Write the self-describing inference artifact (the annonet.dnn analog)."""
    meta = {
        "format": _FORMAT,
        "kind": "runtime_net",
        "anno_classes_json": anno_classes_json,
        "downscaling_factor": float(downscaling_factor),
        "model_config": config.to_dict(),
    }
    arrays = {
        "params" + _SEP + k: v for k, v in flatten_tree(runtime_params).items()
    }
    arrays["__meta__"] = np.frombuffer(
        json.dumps(meta).encode("utf-8"), dtype=np.uint8
    )
    _atomic_savez(path, **arrays)


def load_model(path: str) -> Tuple[Any, SegNetConfig, str, float]:
    """Read back (runtime_params, config, anno_classes_json, downscaling)."""
    with np.load(path) as z:
        meta = json.loads(bytes(z["__meta__"]).decode("utf-8"))
        if meta.get("format") != _FORMAT or meta.get("kind") != "runtime_net":
            raise RuntimeError(f"{path} is not an annonet-tpu model file")
        flat = {
            k[len("params" + _SEP) :]: z[k]
            for k in z.files
            if k.startswith("params" + _SEP)
        }
    params = unflatten_tree(flat)
    config = SegNetConfig.from_dict(meta["model_config"])
    return params, config, meta["anno_classes_json"], meta["downscaling_factor"]


def save_trainer_state(path: str, trees: Dict[str, Any], meta: Dict[str, Any]) -> None:
    """Write full training state: ``trees`` maps names (params/bn_stats/velocity)
    to pytrees; ``meta`` holds JSON-serializable scalars (lr, step, losses)."""
    arrays: Dict[str, np.ndarray] = {}
    for name, tree in trees.items():
        for k, v in flatten_tree(tree).items():
            arrays[name + _SEP + k] = v
    payload = {"format": _FORMAT, "kind": "trainer_state", "meta": meta,
               "tree_names": sorted(trees.keys())}
    arrays["__meta__"] = np.frombuffer(
        json.dumps(payload).encode("utf-8"), dtype=np.uint8
    )
    _atomic_savez(path, **arrays)


def load_trainer_meta(path: str) -> Dict[str, Any]:
    """Read ONLY the meta dict of a trainer-state file (lazy single-member
    npz read — the multi-host resume pre-check runs on every rank and must
    not decompress the full parameter payload twice per rank)."""
    with np.load(path) as z:
        payload = json.loads(bytes(z["__meta__"]).decode("utf-8"))
    if payload.get("format") != _FORMAT or payload.get("kind") != "trainer_state":
        raise RuntimeError(f"{path} is not an annonet-tpu trainer state file")
    return payload["meta"]


def load_trainer_state(path: str) -> Tuple[Dict[str, Any], Dict[str, Any]]:
    """Read back (trees, meta) written by save_trainer_state."""
    with np.load(path) as z:
        payload = json.loads(bytes(z["__meta__"]).decode("utf-8"))
        if payload.get("format") != _FORMAT or payload.get("kind") != "trainer_state":
            raise RuntimeError(f"{path} is not an annonet-tpu trainer state file")
        trees: Dict[str, Any] = {}
        for name in payload["tree_names"]:
            flat = {
                k[len(name + _SEP) :]: z[k]
                for k in z.files
                if k.startswith(name + _SEP)
            }
            trees[name] = unflatten_tree(flat)
    return trees, payload["meta"]


def weights_fingerprint(runtime_params: Any) -> str:
    """sha256 over the flattened parameter tree (paths + raw bytes):
    identifies the exact trained weights, not just the architecture."""
    import hashlib

    h = hashlib.sha256()
    for key, arr in sorted(flatten_tree(runtime_params).items()):
        h.update(key.encode("utf-8"))
        a = np.ascontiguousarray(np.asarray(arr))
        h.update(str(a.dtype).encode("utf-8"))
        h.update(str(a.shape).encode("utf-8"))
        h.update(a.tobytes())
    return h.hexdigest()


def save_calibration(
    path: str,
    calibration,
    config: SegNetConfig,
    runtime_params: Any = None,
) -> None:
    """Persist int8 activation-calibration maxima (TPU-native extension).

    ``calibration`` is TiledInferer.export_calibration()'s list of
    per-layer, per-REAL-channel post-ReLU activation maxima. Persisting
    them makes int8 deployments reproducible across restarts — a server
    or CLI started with the saved set skips runtime calibration and runs
    int8 from the very first image. The model config AND (when
    ``runtime_params`` is given) a weights fingerprint travel along and
    are verified at load: activation ranges depend on the trained
    weights, so a calibration from a retrained model must not silently
    apply even when the architecture matches.
    """
    _atomic_savez(path, **_calibration_arrays(
        calibration, config, runtime_params
    ))


def calibration_npz_bytes(
    calibration,
    config: SegNetConfig,
    runtime_params: Any = None,
) -> bytes:
    """The save_calibration npz as in-memory bytes — byte-compatible with
    the file format, so load_calibration reads it back verbatim. Backs
    annonet_serve's ``GET /calibration`` download (export the scales a
    live int8 server froze on real traffic, for reproducible redeploys
    via ``--calibration``)."""
    import io

    buf = io.BytesIO()
    np.savez(buf, **_calibration_arrays(calibration, config, runtime_params))
    return buf.getvalue()


def _calibration_arrays(calibration, config, runtime_params):
    if not calibration:
        raise ValueError("empty calibration (no frozen int8 net to export)")
    meta = {
        "format": _FORMAT,
        "kind": "int8_calibration",
        "model_config": config.to_dict(),
        "layer_count": len(calibration),
    }
    if runtime_params is not None:
        meta["weights_sha256"] = weights_fingerprint(runtime_params)
    arrays = {
        f"layer{_SEP}{i:03d}": np.asarray(v, np.float32)
        for i, v in enumerate(calibration)
    }
    arrays["__meta__"] = np.frombuffer(
        json.dumps(meta).encode("utf-8"), dtype=np.uint8
    )
    return arrays


def load_calibration(path: str, config: SegNetConfig,
                     runtime_params: Any = None):
    """Read back a save_calibration file; raises if it was produced for a
    different model config, or (when both sides carry a fingerprint) for
    different trained weights."""
    with np.load(path) as z:
        meta = json.loads(bytes(z["__meta__"]).decode("utf-8"))
        if (meta.get("format") != _FORMAT
                or meta.get("kind") != "int8_calibration"):
            raise RuntimeError(
                f"{path} is not an annonet-tpu calibration file"
            )
        if meta["model_config"] != config.to_dict():
            raise RuntimeError(
                f"{path} was calibrated for a different model config "
                f"({meta['model_config']} != {config.to_dict()})"
            )
        if runtime_params is not None and "weights_sha256" in meta:
            actual = weights_fingerprint(runtime_params)
            if meta["weights_sha256"] != actual:
                raise RuntimeError(
                    f"{path} was calibrated for different trained weights "
                    "(same architecture, different model — recalibrate "
                    "with --save-calibration)"
                )
        return [
            z[f"layer{_SEP}{i:03d}"] for i in range(meta["layer_count"])
        ]
