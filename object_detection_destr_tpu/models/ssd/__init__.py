from .model import SSD, VGG16Features, build_ssd

__all__ = ["SSD", "VGG16Features", "build_ssd"]
