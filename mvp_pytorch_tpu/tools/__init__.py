from .transforms import VinVLTransform, build_transforms, resize_shape

__all__ = ["VinVLTransform", "build_transforms", "resize_shape"]
