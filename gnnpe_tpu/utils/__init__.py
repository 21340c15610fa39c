from gnnpe_tpu.utils.timers import StageTimer

__all__ = ["StageTimer"]
