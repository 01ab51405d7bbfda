from ubdvss_tpu.ops.ccl import connected_components
from ubdvss_tpu.ops.rect import min_area_rect_from_mask_stack, monotone_chain_hull, min_area_rect
from ubdvss_tpu.ops.postproc import postprocess, postprocess_batch

__all__ = [
    "connected_components",
    "monotone_chain_hull",
    "min_area_rect",
    "min_area_rect_from_mask_stack",
    "postprocess",
    "postprocess_batch",
]
