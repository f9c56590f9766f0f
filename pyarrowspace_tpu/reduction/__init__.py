from .pipeline import (ReductionResult, lloyd_reseed, reduce_corpus,
                       twonn_intrinsic_dim)

__all__ = ["ReductionResult", "lloyd_reseed", "reduce_corpus",
           "twonn_intrinsic_dim"]
