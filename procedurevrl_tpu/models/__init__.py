from .build import MODEL_REGISTRY, build_model, load_embedding_bank, normalize_bank
from .procedurevrl import ProcedureVRL
from .timesformer import TimeSformer
from .order_transformer import OrderTransformer
from .clip_text import CLIPTextEncoder

__all__ = [
    "MODEL_REGISTRY",
    "build_model",
    "load_embedding_bank",
    "normalize_bank",
    "ProcedureVRL",
    "TimeSformer",
    "OrderTransformer",
    "CLIPTextEncoder",
]
