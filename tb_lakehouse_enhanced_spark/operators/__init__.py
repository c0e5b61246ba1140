from .merge import ScdConfig, scd2_merge, scd1_merge, keyed_upsert  # noqa: F401
