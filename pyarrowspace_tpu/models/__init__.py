from .domain_adapter import DomainAdapter
from .encoders import embed_texts, hash_embed

__all__ = ["DomainAdapter", "embed_texts", "hash_embed"]
