"""Minimal pytorch_lightning stub: LightningModule ~= nn.Module for tests."""
import torch.nn as nn


class LightningModule(nn.Module):
    def save_hyperparameters(self, *a, **k):
        pass

    def log(self, *a, **k):
        pass

    def log_dict(self, *a, **k):
        pass


def seed_everything(seed):
    import torch
    torch.manual_seed(seed)


class Callback:
    pass
