from .persist import load_index, save_index

__all__ = ["save_index", "load_index"]
