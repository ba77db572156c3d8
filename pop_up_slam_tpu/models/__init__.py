from .segmentation import (
    SegNetLite,
    classical_ground_mask,
    create_train_state,
    train_step,
    predict_mask,
    load_pretrained_segnet,
)

__all__ = [
    "SegNetLite",
    "classical_ground_mask",
    "create_train_state",
    "train_step",
    "predict_mask",
    "load_pretrained_segnet",
]
