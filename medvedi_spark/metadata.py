"""Package metadata, mirroring `/root/reference/medvedi/metadata.py:1-3`.

The reference exposes ``__package__``/``__description__``/``__version__``
as a standalone importable module; ported user code (and its
`tests/test_metadata.py:4-7`) imports it directly.
"""

__package__ = "medvedi_spark"  # noqa: A001
__description__ = "medvedi-capability analytics engine on PySpark"
__version__ = "0.2.0"
