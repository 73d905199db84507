"""SPARQL front-end (SELECT slice) — sparql_translator.rs / planner_rdf.rs
analogue over the TripleStore."""

from grafeo_spark.lang.sparql.compiler import SparqlCompileError, compile_select, sparql
from grafeo_spark.lang.sparql.parser import SparqlSyntaxError, parse

__all__ = ["parse", "sparql", "compile_select", "SparqlSyntaxError", "SparqlCompileError"]
