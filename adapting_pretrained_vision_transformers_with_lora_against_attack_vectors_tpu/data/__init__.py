from . import augment, fashion, process, synthetic  # noqa: F401
from .io import create_adv_metadata, filter_metadata, read_metadata, save_images  # noqa: F401
from .loader import Batch, Loader, MetadataIndex  # noqa: F401
from .transforms import eval_transform_pil  # noqa: F401
