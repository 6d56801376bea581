from .cleaning import safe_cast, safe_date, trim_all
from .hashing import canonical_kv_json, config_hash, deterministic_id

__all__ = [
    "safe_cast",
    "safe_date",
    "trim_all",
    "canonical_kv_json",
    "config_hash",
    "deterministic_id",
]
