"""Ship UDF code inside the serialized task.

Spark's Python workers do NOT inherit the driver's ``sys.path``: when
a host imports this repo via ``sys.path.insert`` from another cwd,
module-level pandas-UDF functions (pickled by reference) crash on the
workers with ModuleNotFoundError. Registering the UDF-bearing modules
for cloudpickle by-value serialization makes tasks self-contained —
no PYTHONPATH / addPyFile coordination needed on any cluster.
"""

from __future__ import annotations

import sys


def register_self(module_name: str) -> None:
    try:
        from pyspark import cloudpickle

        cloudpickle.register_pickle_by_value(sys.modules[module_name])
    except Exception:
        pass  # older cloudpickle — fall back to by-reference pickling
