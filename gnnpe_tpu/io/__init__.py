from gnnpe_tpu.io.artifacts import ArtifactStore

__all__ = ["ArtifactStore"]
