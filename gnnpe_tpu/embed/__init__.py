from gnnpe_tpu.embed.vde import VertexEmbeddings, gen_vde, gen_vde_device
from gnnpe_tpu.embed.pde import (PathEmbeddings, gen_pde, gen_query_pde_table,
                                 path_groups)

__all__ = ["VertexEmbeddings", "gen_vde", "gen_vde_device",
           "PathEmbeddings", "gen_pde", "gen_query_pde_table", "path_groups"]
