from .dedup import dedup_exact, dedup_keep_first, dedup_keep_last
from .seen import anti_join_seen, bloom_prefilter
from .politeness import politeness_schedule, salted_repartition
from .export import export_contacts

__all__ = [
    "dedup_exact",
    "dedup_keep_first",
    "dedup_keep_last",
    "anti_join_seen",
    "bloom_prefilter",
    "politeness_schedule",
    "salted_repartition",
    "export_contacts",
]
