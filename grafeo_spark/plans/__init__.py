from grafeo_spark.plans import exprs, ir
from grafeo_spark.plans.compiler import Compiler

__all__ = ["Compiler", "exprs", "ir"]
