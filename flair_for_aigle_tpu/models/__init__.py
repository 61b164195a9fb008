# Model zoo: layer library, encoders (ResNet/Swin), decoders (U-Net/UPerNet),
# U-TAE temporal model, multimodal fusion model, checkpoint conversion.
