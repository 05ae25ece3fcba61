from .config import (
    FLAPPIE_MODELS,
    MODELS,
    RUNNIE_MODELS,
    ModelConfig,
    get_model_config,
    nbase_from_flipflop_nparam,
)
from .network import make_transitions_fn, transitions
from .params import init_synthetic, load_npz, save_npz
