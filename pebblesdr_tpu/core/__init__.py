from pebblesdr_tpu.core.block import pytree_dataclass, static_field
from pebblesdr_tpu.core import db
from pebblesdr_tpu.core import windows
from pebblesdr_tpu.core import iqformat
from pebblesdr_tpu.core import siggen

__all__ = ["pytree_dataclass", "static_field", "db", "windows", "iqformat", "siggen"]
