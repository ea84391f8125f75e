from .imagefolder import ImageFolderIndex, IMG_EXTENSIONS
from .loader import HostLoader, load_image_staged, STAGING_SIZE
from .augment import (
    AVAILABLE_COLOR_TRANSFORMS,
    AVAILABLE_GEOM_TRANSFORMS,
    generate_transform_combinations,
    make_augment_fn,
)
