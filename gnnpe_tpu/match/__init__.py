from gnnpe_tpu.match.plan import greedy_path_cover, gql_order, generate_bn
from gnnpe_tpu.match.filter import pe_candidates, pge_candidates
from gnnpe_tpu.match.refine import refinement

__all__ = ["greedy_path_cover", "gql_order", "generate_bn",
           "pe_candidates", "pge_candidates", "refinement"]
