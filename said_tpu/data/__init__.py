"""BlendVOCA data layer: path discovery, datasets, windowing, augmentation."""

from said_tpu.data.blendvoca import (
    BLENDSHAPE_CLASSES,
    BLENDSHAPE_MIRROR_PAIRS,
    PERSON_IDS_TRAIN,
    PERSON_IDS_VAL,
    PERSON_IDS_TEST,
    FPS,
    DataBatch,
    DataItem,
    BlendVOCADataPath,
    BlendVOCATrainDataset,
    BlendVOCAValDataset,
    BlendVOCATestDataset,
    BlendVOCAEvalDataset,
    BlendVOCAVAEDataset,
    BlendVOCAPseudoGTOptDataset,
    get_data_paths,
)
from said_tpu.data.loader import DataLoader

__all__ = [
    "BLENDSHAPE_CLASSES",
    "BLENDSHAPE_MIRROR_PAIRS",
    "PERSON_IDS_TRAIN",
    "PERSON_IDS_VAL",
    "PERSON_IDS_TEST",
    "FPS",
    "DataBatch",
    "DataItem",
    "BlendVOCADataPath",
    "BlendVOCATrainDataset",
    "BlendVOCAValDataset",
    "BlendVOCATestDataset",
    "BlendVOCAEvalDataset",
    "BlendVOCAVAEDataset",
    "BlendVOCAPseudoGTOptDataset",
    "get_data_paths",
    "DataLoader",
]
