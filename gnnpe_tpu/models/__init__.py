from gnnpe_tpu.models.gnn import PathGNN, PathGNNParams, dominance_loss

__all__ = ["PathGNN", "PathGNNParams", "dominance_loss"]
