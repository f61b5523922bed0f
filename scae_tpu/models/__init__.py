from scae_tpu.models.part_encoder import CNNEncoder, CapsuleImageEncoder  # noqa: F401
from scae_tpu.models.part_decoder import (  # noqa: F401
    TemplateBasedImageDecoder,
    TemplateGenerator,
)
from scae_tpu.models.set_transformer import (  # noqa: F401
    ISAB,
    MAB,
    PMA,
    SAB,
    MultiHeadQKVAttention,
    SetTransformer,
)
from scae_tpu.models.object_decoder import (  # noqa: F401
    CapsuleLayer,
    CapsuleObjectDecoder,
    capsule_entropy_loss,
    capsule_l2_loss,
    capsule_likelihood,
    neg_capsule_kl,
    sparsity_loss,
)
from scae_tpu.models.scae import SCAE  # noqa: F401
