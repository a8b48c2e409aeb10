from stoch_gpmp_tpu.utils.paths import get_assets_path, get_root_path
from stoch_gpmp_tpu.utils.timer import Timer, elapsed_time, print_info
from stoch_gpmp_tpu.utils.checkpoint import load_planner_state, save_planner_state

__all__ = [
    "get_assets_path",
    "get_root_path",
    "Timer",
    "elapsed_time",
    "print_info",
    "load_planner_state",
    "save_planner_state",
]
