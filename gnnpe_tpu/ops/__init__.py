from gnnpe_tpu.ops.mt19937 import label_seeded_x
from gnnpe_tpu.ops.spmm import spmm_csr, segment_spmm, neighbor_sum

__all__ = ["label_seeded_x", "spmm_csr", "segment_spmm", "neighbor_sum"]
