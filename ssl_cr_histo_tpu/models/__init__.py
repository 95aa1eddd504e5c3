"""Model zoo: flax ResNet backbones and the SSL_CR_Histo heads."""

from ssl_cr_histo_tpu.models.resnet import ResNet, ResNet18, ResNet50  # noqa: F401
from ssl_cr_histo_tpu.models.nets import (  # noqa: F401
    Classifier,
    TripletNet,
    TripletNetFinetune,
    FinetuneHead,
    feature_dim,
)
