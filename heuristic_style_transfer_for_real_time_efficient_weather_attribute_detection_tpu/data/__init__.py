"""Data pipeline: multi-task dataset manifest, threaded prefetching loader."""

from .dataset import (  # noqa: F401
    BatchLoader,
    MultiTaskDataset,
    collect_image_paths,
    map_folder_to_class,
)
