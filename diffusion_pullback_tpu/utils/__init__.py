from .images import load_image, save_image_grid, to_uint8
from .logging import JSONLLogger

__all__ = ["load_image", "save_image_grid", "to_uint8", "JSONLLogger"]
