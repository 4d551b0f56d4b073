from ssrg_tpu.models.heads import (  # noqa: F401
    IdenticalMapping,
    LogisticRegression,
    MultiLayerPerceptron,
    ResMultiLayerPerceptron,
    Layer2GraphConvolution,
    FeatureAugment2MLP,
)
from ssrg_tpu.models.zoo import ModelSpec, load_model, MODEL_REGISTRY  # noqa: F401
