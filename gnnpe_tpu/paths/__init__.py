from gnnpe_tpu.paths.enumerate import (enumerate_paths, enumerate_paths_from,
                                       dedup_orientations)

__all__ = ["enumerate_paths", "enumerate_paths_from", "dedup_orientations"]
