"""SPARQL front-end (SELECT + UPDATE slice) — sparql_translator.rs /
planner_rdf.rs analogue over the TripleStore."""

from grafeo_spark.lang.sparql.compiler import (
    SparqlCompileError,
    compile_select,
    compile_update,
    sparql,
    sparql_update,
)
from grafeo_spark.lang.sparql.parser import SparqlSyntaxError, parse

__all__ = [
    "parse",
    "sparql",
    "sparql_update",
    "compile_select",
    "compile_update",
    "SparqlSyntaxError",
    "SparqlCompileError",
]
