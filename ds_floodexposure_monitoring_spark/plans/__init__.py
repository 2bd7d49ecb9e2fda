"""Driver-contract query registry.

``REGISTRY`` maps query name → QuerySpec(spark_fn, oracle_sql, note).
``__spark_entry__.py`` exposes it to the driver; tests run every pair
against DuckDB at small scale.
"""

from .contract import REGISTRY as _CORE
from .contract_docs import REGISTRY as _DOCS
from .contract_streaming import REGISTRY as _STREAM
from .spec import QuerySpec  # noqa: F401

REGISTRY: dict[str, QuerySpec] = {**_CORE, **_DOCS, **_STREAM}
