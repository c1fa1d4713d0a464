"""Minimal omegaconf stub so the reference torch modules import offline."""
class ListConfig(list):
    pass
