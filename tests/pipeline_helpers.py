"""Module-level named stage functions for pipeline persistence tests
(save_pipeline requires importable functions, not lambdas)."""


def drop_nulls_v(df):
    return df.dropna(subset=["v"])
