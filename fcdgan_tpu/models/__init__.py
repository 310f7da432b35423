from .discriminator import Discriminator
from .generator import Generator
from .segmentor import Segmentor

__all__ = ["Discriminator", "Generator", "Segmentor"]
