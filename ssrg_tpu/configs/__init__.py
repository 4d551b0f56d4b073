from ssrg_tpu.configs.config import (  # noqa: F401
    DataConfig,
    DataProcessConfig,
    DataAugmentConfig,
    ModelConfig,
    TrainingConfig,
    WaveletConfig,
    FrameworkConfig,
)
