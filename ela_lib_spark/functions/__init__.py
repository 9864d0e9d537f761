from ela_lib_spark.functions.text import (  # noqa: F401
    TOKEN_RE,
    extract_text,
    extract_text_series,
    tokenize,
    tokenize_list,
)
