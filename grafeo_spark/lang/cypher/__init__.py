from grafeo_spark.lang.cypher.parser import parse
from grafeo_spark.lang.cypher.translator import translate

__all__ = ["parse", "translate"]
