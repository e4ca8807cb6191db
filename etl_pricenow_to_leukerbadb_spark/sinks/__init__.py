from .upsert import assert_keys_not_null, merge_upsert_df, merge_upsert_parquet  # noqa: F401
