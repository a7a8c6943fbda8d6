from tpu_unet.data.loading import (
    BasicDataset,
    CarvanaDataset,
    load_image,
    random_split_indices,
    unique_mask_values,
)
from tpu_unet.data.prefetch import DataLoader, collate, prefetch_to_device
from tpu_unet.data.synthetic import (
    HELDOUT_GEN,
    OVERHEAD_GEN,
    OVERHEAD_HELDOUT_GEN,
    TRAIN_GEN,
    make_synthetic_carvana,
    synth_batch,
)

__all__ = [
    "BasicDataset",
    "CarvanaDataset",
    "load_image",
    "random_split_indices",
    "unique_mask_values",
    "DataLoader",
    "collate",
    "prefetch_to_device",
    "HELDOUT_GEN",
    "OVERHEAD_GEN",
    "OVERHEAD_HELDOUT_GEN",
    "TRAIN_GEN",
    "make_synthetic_carvana",
    "synth_batch",
]
