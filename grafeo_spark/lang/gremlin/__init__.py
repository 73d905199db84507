"""Gremlin front-end — fluent traversal API + string form
(gremlin_translator.rs / ast.rs:31-157 analogue)."""

from grafeo_spark.lang.gremlin.parser import execute
from grafeo_spark.lang.gremlin.traversal import (
    Anon,
    GremlinError,
    GremlinSource,
    P,
    TextP,
    Traversal,
    __,
    traversal,
)

__all__ = [
    "execute", "traversal", "GremlinSource", "Traversal", "P", "TextP",
    "GremlinError", "Anon", "__",
]
