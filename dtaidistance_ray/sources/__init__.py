from .synth import token_table, token_table_arrow, TokenTableSpec  # noqa: F401
