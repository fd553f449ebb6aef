"""KQL front-end: tokenizer → pipeline parser → DataFrame translator
(SURVEY.md §3.3 — the reference's declared query language,
reference README.md:33-34)."""

from meerkat_spark.kql.lexer import KqlSyntaxError, tokenize
from meerkat_spark.kql.parser import parse_kql
from meerkat_spark.kql.translator import execute_kql

__all__ = ["tokenize", "parse_kql", "execute_kql", "KqlSyntaxError"]
