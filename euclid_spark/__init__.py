"""euclid_spark — a PySpark-native analytics engine with the query and
data-processing capabilities of Lagrange-Labs/Euclid-database.

The reference (/root/reference, Rust/plonky2) indexes blockchain storage
into a verifiable database (storage DB / state DB / append-only block DB)
and answers block-range queries (distinct-key sets, guarded weighted sums)
over it. This package re-expresses those semantics — and a full OLAP +
LLM-training-data operator surface — as idiomatic Spark DataFrame plans.

See SURVEY.md for the capability inventory and architecture.
"""

__version__ = "0.1.0"

from euclid_spark.session import get_session  # noqa: F401
from euclid_spark.catalog import load_tables, register_views, TABLES  # noqa: F401
