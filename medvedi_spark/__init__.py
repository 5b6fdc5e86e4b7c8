"""medvedi-capability analytics engine, PySpark-native.

Package-level surface mirrors the reference
(`/root/reference/medvedi/__init__.py:1-5`): the frame class, Grouper,
Index, and the module-level ``concat``/``join``. ``DataFrame`` aliases
``MDF`` so ported reference code keeps its import lines.
"""

from medvedi_spark.frame import MDF, Grouper, Index, concat, join, sql

DataFrame = MDF

__description__ = "medvedi-capability analytics engine on PySpark"
__version__ = "0.3.0"

__all__ = ["DataFrame", "Grouper", "Index", "MDF", "concat", "join", "sql"]
