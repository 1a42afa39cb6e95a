from .repair import repair_role_rotation
from .argmax import arg_max
from .asof import asof_join, range_join_bucketed
from .dedup import (
    dedup_exact,
    embedding_neardup,
    lsh_candidate_pairs,
    minhash_signatures,
    ngram_jaccard,
    simhash,
)
from .rank import global_row_number
from .scd2 import OPEN_SENTINEL, insert_only_merge, scd2_apply
from .similarity import cosine_topk, lsh_bucketed_topk
from .skew import salted_agg
from .snapshots import filter_latest, filter_top_snapshots

__all__ = [
    "repair_role_rotation",
    "OPEN_SENTINEL",
    "insert_only_merge",
    "scd2_apply",
    "arg_max",
    "asof_join",
    "range_join_bucketed",
    "dedup_exact",
    "embedding_neardup",
    "lsh_candidate_pairs",
    "minhash_signatures",
    "ngram_jaccard",
    "simhash",
    "cosine_topk",
    "lsh_bucketed_topk",
    "salted_agg",
    "global_row_number",
    "filter_latest",
    "filter_top_snapshots",
]
