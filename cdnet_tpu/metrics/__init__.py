"""Evaluation metrics: pixel-level and instance-level (AJI / AJI+ / PQ / Dice)."""
from cdnet_tpu.metrics.pixel import (  # noqa: F401
    accuracy_pixel_level,
    compute_pixel_level_metrics,
)
from cdnet_tpu.metrics.objects import (  # noqa: F401
    gland_accuracy_object_level,
    label_equal_values,
    nuclei_accuracy_object_level,
    read_annotation_xml,
)
from cdnet_tpu.metrics.instance import (  # noqa: F401
    get_dice_1,
    get_fast_aji,
    get_fast_aji_plus,
    get_fast_dice_2,
    get_fast_pq,
    pair_coordinates,
    remap_label,
)
