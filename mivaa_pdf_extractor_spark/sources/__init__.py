from .synthetic import gen_corpus, corpus_to_spark_df, INPUT_SCHEMA  # noqa: F401
