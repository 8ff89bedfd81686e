"""Dataset scanning: pair anno images with their *_mask.png ground truth.

Reference behavior reproduced from:
  * /root/reference/annonet.cpp:60-129 (find_image_files: extension filter,
    *_mask.png / *_result.png exclusion, mask pairing, require_ground_truth,
    throttled progress printing)
  * /root/reference/annonet_train_main.cpp:236-256 (read_anno_classes_file:
    anno_classes.json must live at the dataset root, exactly one allowed)
"""

from __future__ import annotations

import dataclasses
import os
import sys
import time
from typing import List

# Extension filter parity with annonet.cpp:75-79 (dlib::match_ending is
# case-sensitive; the reference accepts exactly these five endings).
_ACCEPTED_ENDINGS = (".jpeg", ".jpg", ".JPG", ".png", ".PNG")
_EXCLUDED_ENDINGS = ("_mask.png", "_result.png")


@dataclasses.dataclass(frozen=True)
class ImageFilenames:
    """An input image path plus its optional ground-truth mask path.

    Mirrors image_filenames_type (annonet.h:41-45).
    """

    image_filename: str
    label_filename: str = ""


def find_image_files(
    anno_data_folder: str,
    require_ground_truth: bool,
    verbose: bool = True,
) -> List[ImageFilenames]:
    """Recursively find annotatable images and pair them with masks.

    Semantics parity with find_image_files (annonet.cpp:60-129):
      * accepts .jpeg/.jpg/.JPG/.png/.PNG, excluding *_mask.png and
        *_result.png
      * ground truth for <image> is <image>_mask.png (full filename + suffix)
      * require_ground_truth=True drops images without a mask
      * progress is printed at most every 100 ms
    """
    out = sys.stdout
    if verbose:
        out.write("\nScanning...")
        out.flush()

    candidates: List[str] = []
    for dirpath, _dirnames, filenames in os.walk(anno_data_folder):
        for name in filenames:
            if name.endswith(_EXCLUDED_ENDINGS):
                continue
            if name.endswith(_ACCEPTED_ENDINGS):
                candidates.append(os.path.join(dirpath, name))
    candidates.sort()

    if verbose:
        out.write(" found %d candidates\n" % len(candidates))

    results: List[ImageFilenames] = []
    added = 0
    ignored = 0
    progress_last_printed = time.monotonic()

    total = len(candidates)
    for i, image_filename in enumerate(candidates):
        label_filename = image_filename + "_mask.png"
        label_file_exists = os.path.isfile(label_filename)

        if label_file_exists:
            results.append(ImageFilenames(image_filename, label_filename))
            added += 1
        elif not require_ground_truth:
            results.append(ImageFilenames(image_filename, ""))
            added += 1
        else:
            ignored += 1

        now = time.monotonic()
        if verbose and (
            i == 0 or i == total - 1 or (now - progress_last_printed) > 0.1
        ):
            out.write(
                "\rScanned %.2f %% of %d files: %d added, %d ignored"
                % ((i + 1) * 100.0 / total, total, added, ignored)
            )
            out.flush()
            progress_last_printed = now

    if verbose:
        out.write("\n")
        out.flush()

    return results


def read_anno_classes_file(folder: str) -> str:
    """Read anno_classes.json from the dataset root (not subdirectories).

    Parity with read_anno_classes_file (annonet_train_main.cpp:236-256):
    missing file -> warning + empty string (callers fall back to the default
    palette); more than one match is impossible within a single directory, but
    the check is kept for behavioral clarity.
    """
    path = os.path.join(folder, "anno_classes.json")
    if not os.path.isfile(path):
        print("Warning: no anno_classes.json file found in " + folder)
        print(" --> Using the default anno classes")
        return ""
    with open(path, "r", encoding="utf-8") as f:
        return f.read()
