from .registry import load_table, union_scan  # noqa: F401
from .signals import signals_view, SIGNALS_ORACLE_CTE  # noqa: F401
from .textfiles import read_csv, read_jsonl  # noqa: F401
