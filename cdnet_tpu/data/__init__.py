"""Data pipeline: file pairing, loading, host-side augmentation feeding device arrays."""
from cdnet_tpu.data.dataset import DataFolder, get_imgs_list, img_loader  # noqa: F401
