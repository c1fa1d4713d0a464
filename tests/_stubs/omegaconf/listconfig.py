from omegaconf import ListConfig  # noqa: F401
