from .domain_adapter import DomainAdapter
from .encoders import embed_texts, hash_embed
from .tsdae import TSDAEConfig, TSDAEEncoder, adapt_corpus

__all__ = ["DomainAdapter", "embed_texts", "hash_embed",
           "TSDAEConfig", "TSDAEEncoder", "adapt_corpus"]
