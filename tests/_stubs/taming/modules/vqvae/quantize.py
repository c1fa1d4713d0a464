"""Stub VectorQuantizer2 (only needed for legacy VQ models, unused here)."""
import torch.nn as nn


class VectorQuantizer2(nn.Module):
    def __init__(self, *a, **k):
        super().__init__()
