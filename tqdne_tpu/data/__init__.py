from tqdne_tpu.data.dataset import ClassificationDataset, Dataset, PairedDataset
from tqdne_tpu.data.pipeline import BatchLoader
from tqdne_tpu.data.representation import (
    Identity,
    LogSpectrogram,
    MovingAverageEnvelope,
    Normalization,
    Representation,
)

__all__ = [
    "Dataset", "ClassificationDataset", "PairedDataset", "BatchLoader",
    "Representation", "Identity", "Normalization", "MovingAverageEnvelope",
    "LogSpectrogram",
]
