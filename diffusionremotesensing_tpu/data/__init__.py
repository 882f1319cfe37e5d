from diffusionremotesensing_tpu.data.loader import DataLoader  # noqa: F401
from diffusionremotesensing_tpu.data.datasets import (  # noqa: F401
    ImageFolderDataset,
    SarToNdviDataset,
    SuperresBSRGANDataset,
    SuperresDownBlurDataset,
)
