from .repair import repair_role_rotation
from .argmax import arg_max
from .rank import global_row_number
from .scd2 import OPEN_SENTINEL, insert_only_merge, scd2_apply
from .snapshots import filter_latest, filter_top_snapshots

__all__ = [
    "repair_role_rotation",
    "OPEN_SENTINEL",
    "insert_only_merge",
    "scd2_apply",
    "arg_max",
    "global_row_number",
    "filter_latest",
    "filter_top_snapshots",
]
