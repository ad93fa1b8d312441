"""Data layer (L5): dataset catalogs + host-side decode/preprocess pipeline.

Replaces the reference's torch Dataset/DataLoader zoo (data/, 16 classes)
with numpy-native datasets keyed by the same mode strings
(data/__init__.py:57-88) and a double-buffered device prefetcher.
"""

from motif_tpu.data.datasets import (  # noqa: F401
    WindowEvalDataset,
    Vimeo7Dataset,
    AdobeArbitraryDataset,
    AdobeSeptupletDataset,
    VimeoArbitraryDataset,
    ArbitraryScaleTestDataset,
    create_dataset,
)
from motif_tpu.data.pipeline import (  # noqa: F401
    BatchLoader,
    Subset,
    collate_adobe_arbitrary,
    device_prefetch,
)
