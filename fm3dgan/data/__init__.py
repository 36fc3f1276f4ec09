from fm3dgan.data.datasets import (
    EditingDataset,
    ImageFolderDataset,
    ReconstructionDataset,
    SyntheticPairDataset,
    load_image,
)
from fm3dgan.data.samplers import (
    dual_supervision_indices,
    extreme_pose_indices,
    swap_list_pair,
)
from fm3dgan.data.loader import (
    DataLoader,
    RandomFakeData,
    data_loading,
)

__all__ = [
    "EditingDataset",
    "ImageFolderDataset",
    "ReconstructionDataset",
    "SyntheticPairDataset",
    "load_image",
    "dual_supervision_indices",
    "extreme_pose_indices",
    "swap_list_pair",
    "DataLoader",
    "RandomFakeData",
    "data_loading",
]
