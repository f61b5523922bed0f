from scae_tpu.ops.math_ops import (  # noqa: F401
    cross_entropy_safe,
    l2_loss,
    log_safe,
    normalize,
    relu1,
)
from scae_tpu.ops.geometry import geometric_transform  # noqa: F401
from scae_tpu.ops.pooling import (  # noqa: F401
    multiple_attention_pooling_2d,
    multiple_soft_attention,
    soft_attention,
)
from scae_tpu.ops.attention import qkv_attention  # noqa: F401
from scae_tpu.ops.warp import affine_warp, bilinear_weight_matrices  # noqa: F401
from scae_tpu.ops.gmm import GaussianMixture  # noqa: F401
from scae_tpu.ops.decoder_ll import fused_decoder_ll  # noqa: F401
from scae_tpu.ops.pallas_attention import pallas_qkv_attention  # noqa: F401
from scae_tpu.ops.pallas_decoder_ll import pallas_decoder_ll  # noqa: F401
from scae_tpu.ops.pallas_decoder_ll_banded import (  # noqa: F401
    pallas_decoder_ll_banded,
)
from scae_tpu.ops.pallas_decoder_ll_gather import (  # noqa: F401
    pallas_decoder_ll_gather,
)
