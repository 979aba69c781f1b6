from orcai_tpu.models.crnn import (
    ORCAI_ARCHITECTURES,
    ResNet1DConv,
    ResNetLSTM,
    ResNetTCN,
    build_model,
    init_variables,
    l2_regularization,
)

__all__ = [
    "ORCAI_ARCHITECTURES",
    "ResNetLSTM",
    "ResNet1DConv",
    "ResNetTCN",
    "build_model",
    "init_variables",
    "l2_regularization",
]
