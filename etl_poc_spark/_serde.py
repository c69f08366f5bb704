"""Self-contained UDF closures.

Python UDF closures (mapInPandas / applyInPandas / foreachPartition) are
cloudpickled BY REFERENCE to their defining module by default, which makes
executor workers `import etl_poc_spark` — and fail whenever the package is
only on the driver's sys.path (interactive use from another cwd, clusters
without the package shipped to workers). Registering the UDF-bearing
modules for by-value pickling makes every closure self-contained: no
worker-side install or --py-files needed.

Each module that defines UDF closures calls `register_by_value(__name__)`
at import time.
"""

from __future__ import annotations

import sys


def register_by_value(module_name: str) -> None:
    try:
        from pyspark import cloudpickle

        cloudpickle.register_pickle_by_value(sys.modules[module_name])
    except Exception:  # noqa: BLE001 — serialization fallback is by-reference
        pass
