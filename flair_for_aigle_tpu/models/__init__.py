# Model zoo: layer library, encoders (ResNet/Swin), decoders (U-Net/UPerNet),
# U-TAE temporal model, multimodal fusion model, checkpoint conversion.
from flair_for_aigle_tpu.models.flair_model import (
    FLAIR_TRANSPOSE_CONV_PATTERNS,
    FlairHubModel,
)
from flair_for_aigle_tpu.models.monotemp import SmpModel

__all__ = ["FlairHubModel", "SmpModel", "FLAIR_TRANSPOSE_CONV_PATTERNS"]
