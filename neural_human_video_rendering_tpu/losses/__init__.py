from .gan import lsgan_loss_d, lsgan_loss_g, feature_matching_loss  # noqa: F401
from .perceptual import vgg_loss  # noqa: F401
from .recon import (l2_loss, uv_loss, uv_grad_loss, part_ce_loss,  # noqa: F401
                    mask_loss, ms_iuv_loss)
from .temporal import temporal_flow_loss, occlusion_mask  # noqa: F401
