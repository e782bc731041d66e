from . import gold, fixedpoint, xla_ref
from .kernel import finalize_topk
