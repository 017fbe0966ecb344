"""Input pipeline (SURVEY.md §2 #13–#15, §3.4).

The reference's DataLoader-worker stack (pycocotools load → cv2/skimage
transforms → collate-to-batch-max padding) becomes:
  * host: decode + letterbox-resize to a FIXED canvas (uint8) + box math
  * device: normalize / flip / crop fused into the jitted train step
    (benchmark config 4 "fused on-device augmentation")
  * static shapes end to end — no per-batch max-size collation, no retrace
"""

from detjax.data.coco import CocoDataset, COCO_CLASSES
from detjax.data.csv_dataset import CSVDataset
from detjax.data.synthetic import SyntheticDetectionDataset
from detjax.data.transforms import letterbox, hflip_boxes, normalize_image
from detjax.data.pipeline import (
    DetectionIterator,
    make_train_iterator,
    make_eval_iterator,
    device_augment,
)

__all__ = [
    "CocoDataset",
    "COCO_CLASSES",
    "CSVDataset",
    "SyntheticDetectionDataset",
    "letterbox",
    "hflip_boxes",
    "normalize_image",
    "DetectionIterator",
    "make_train_iterator",
    "make_eval_iterator",
    "device_augment",
]
