from .assignment import auction_assignment, batched_assignment
from .attention import (
    combine_heads,
    multi_head_attention,
    scaled_dot_product_attention,
    split_heads,
)
from .focal import focal_cost_terms, sigmoid_focal_loss
from .nms import nms_greedy, nms_triangular
from .topk import masked_topk_with_recycle

__all__ = [
    "auction_assignment",
    "batched_assignment",
    "combine_heads",
    "focal_cost_terms",
    "masked_topk_with_recycle",
    "multi_head_attention",
    "nms_greedy",
    "nms_triangular",
    "scaled_dot_product_attention",
    "sigmoid_focal_loss",
    "split_heads",
]
