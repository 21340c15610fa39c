from gnnpe_tpu.index.packed import PackedDominanceIndex

__all__ = ["PackedDominanceIndex"]
