from gnnpe_tpu.graph.csr import CSRGraph
from gnnpe_tpu.graph.dynamic import DynamicGraph
from gnnpe_tpu.graph.partition import partition_graph, degree_sorted_nodes

__all__ = ["CSRGraph", "DynamicGraph", "partition_graph", "degree_sorted_nodes"]
