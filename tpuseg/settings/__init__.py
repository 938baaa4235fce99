"""Dataset settings shim.

Mirrors the reference's ``settings`` package
(``code/settings/CVPPP/{data,model,training}_settings.py``) as factories
over the typed Config tree; per-dataset path layout helpers live here too.
"""

from __future__ import annotations

import os

from tpuseg.configs import Config, cvppp_config

_DATASETS = ("CVPPP",)


def get_config(dataset: str) -> Config:
    assert dataset in _DATASETS, f"unknown dataset {dataset}"
    return cvppp_config()


def default_data_paths(cfg: Config, dataset: str):
    """Reference LMDB layout (training_settings.py:10-23) transposed to the
    packed-record format: <base>/processed/<ds>/records/{training,validation}."""
    base = cfg.data.base_path
    root = os.path.join(base, "processed", dataset, "records")
    return os.path.join(root, "training"), os.path.join(root, "validation")


# Class-style aliases for reference-API familiarity.
class CVPPPDataSettings:
    """Reference ``DataSettings`` (settings/CVPPP/data_settings.py:3-19)."""

    def __init__(self):
        cfg = cvppp_config()
        self.cfg = cfg
        self.BASE_PATH = cfg.data.base_path
        self.CLASS_WEIGHTS = cfg.data.class_weights
        self.MAX_N_OBJECTS = cfg.data.max_n_objects
        self.N_CLASSES = cfg.data.n_classes


class CVPPPModelSettings:
    def __init__(self):
        cfg = cvppp_config()
        self.cfg = cfg
        self.MODEL_NAME = cfg.model.name
        self.N_CLASSES = cfg.data.n_classes
        self.MAX_N_OBJECTS = cfg.data.max_n_objects
        self.USE_INSTANCE_SEGMENTATION = cfg.model.use_instance_segmentation
        self.USE_COORDINATES = cfg.model.use_coordinates
        self.IMAGE_HEIGHT = cfg.data.image_height
        self.IMAGE_WIDTH = cfg.data.image_width
        self.MEAN = list(cfg.data.mean)
        self.STD = list(cfg.data.std)


class CVPPPTrainingSettings(CVPPPModelSettings):
    def __init__(self):
        super().__init__()
        cfg = self.cfg
        self.OPTIMIZER = cfg.train.optimizer
        self.LEARNING_RATE = cfg.train.learning_rate
        self.LR_DROP_FACTOR = cfg.train.lr_drop_factor
        self.LR_DROP_PATIENCE = cfg.train.lr_drop_patience
        self.WEIGHT_DECAY = cfg.train.weight_decay
        self.CLIP_GRAD_NORM = cfg.train.clip_grad_norm
        self.CRITERION = cfg.train.criterion
        self.SEED = cfg.train.seed
