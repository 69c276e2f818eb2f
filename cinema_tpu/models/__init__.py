"""Model zoo: CineMA MAE, ConvViT, ConvUNetR, UNet, ResNet."""
