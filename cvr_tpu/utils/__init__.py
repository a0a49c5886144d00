from cvr_tpu.utils.timing import Timer, PhaseTimer

__all__ = ["Timer", "PhaseTimer"]
