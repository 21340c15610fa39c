from gnnpe_tpu.index.packed import PackedDominanceIndex, PGEPackedIndex

__all__ = ["PackedDominanceIndex", "PGEPackedIndex"]
