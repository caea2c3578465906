from .grid_sample import (grid_sample, flow_warp,  # noqa: F401
                          texture_warp_reference, texture_warp_topk)  # noqa: F401
from .pallas_warp import texture_warp  # noqa: F401
from .pallas_flow_warp import flow_warp_fast, flow_warp_pallas  # noqa: F401
