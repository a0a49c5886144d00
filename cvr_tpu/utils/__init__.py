from cvr_tpu.utils.timing import Timer, PhaseTimer
from cvr_tpu.utils.report import append_result, append_jsonl

__all__ = ["Timer", "PhaseTimer", "append_result", "append_jsonl"]
