#!/usr/bin/env python
"""Create a tiny synthetic image tree + dataset manifest for smoke tests.

Layout:
  <out>/images/<class_dir>/<name>.jpg     (class dirs named after Weather
                                           Type-ish benchmark classes)
  <out>/dataset.json                      (MultiTaskDataset manifest)
  <out>/tasks.json                        (3-task registry)
  <out>/mapping.json                      (benchmark class mapping)
"""

import json
import os
import sys

import numpy as np
from PIL import Image

TASKS = {
    "Weather Type": ["Clear", "Rain", "Snow", "Fog"],
    "Visibility": ["Low", "Good"],
    "Glare or Reflections": ["Absent", "Present"],
}
MAPPING = {
    "Weather Type": {
        "sun": ["Clear"],
        "rain": ["Rain"],
        "snow": ["Snow"],
        "fog": ["Fog"],
    }
}
BENCH_DIRS = ["sun", "rain", "snow", "fog"]


def make(
    out: str, n_per_class: int = 3, size: int = 96, seed: int = 0,
    full_labels: bool = False,
) -> str:
    rng = np.random.RandomState(seed)
    img_root = os.path.join(out, "images")
    manifest = {}
    for ci, cdir in enumerate(BENCH_DIRS):
        d = os.path.join(img_root, cdir)
        os.makedirs(d, exist_ok=True)
        folder_entry = {}
        for i in range(n_per_class):
            arr = rng.randint(0, 256, (size, size, 3), np.uint8)
            arr[:, :, ci % 3] = (arr[:, :, ci % 3] // 2) + 100  # class-ish tint
            name = f"{cdir}_{i}.jpg"
            path = os.path.join(d, name)
            Image.fromarray(arr).save(path)
            folder_entry[name] = {
                "image_path": path,
                "Weather Type": TASKS["Weather Type"][ci],
                "Visibility": "Low" if ci % 2 else "Good",
                # leave 'Glare or Reflections' unlabeled for some images to
                # exercise the IGNORE_INDEX path (unless full_labels)
                **(
                    {"Glare or Reflections": "Absent"}
                    if (full_labels or i % 2 == 0)
                    else {}
                ),
            }
        manifest[cdir] = folder_entry
    with open(os.path.join(out, "dataset.json"), "w") as f:
        json.dump(manifest, f, indent=2)
    with open(os.path.join(out, "tasks.json"), "w") as f:
        json.dump(TASKS, f, indent=2)
    with open(os.path.join(out, "mapping.json"), "w") as f:
        json.dump(MAPPING, f, indent=2)
    return out


if __name__ == "__main__":
    out = sys.argv[1] if len(sys.argv) > 1 else "/tmp/synth_weather"
    make(out)
    print("synthetic dataset at", out)
