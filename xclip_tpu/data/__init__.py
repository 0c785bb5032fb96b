from xclip_tpu.data.datasets import (  # noqa: F401
    CombinedNet,
    CompositionDataset,
    CorruptedImageNet,
    DomainNetCaptions,
    ImageNet,
    ImageNetCaptions,
    ImageNetSketch,
    SyntheticDataset,
    TsvDataset,
)
from xclip_tpu.data.loader import DataLoader, tokenizing_collate  # noqa: F401
from xclip_tpu.data.transforms import image_transform  # noqa: F401
