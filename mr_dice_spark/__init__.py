"""mr_dice_spark — a PySpark-native analytics engine with the query and
data-processing capabilities of the reference system (NingWang-art/Mr-Dice),
re-expressed Spark-first.

The reference is a federated materials-database query layer (five modules:
OPTIMADE fan-out, MOFdb SQL, MOFdb REST, OpenLAM, Bohrium). This engine
reproduces *what those modules compute* — the predicate language, the
relational/analytic SQL surface, fair-quota top-k / dedup / projection
post-processing, and the domain scalar functions — as idiomatic Spark
SQL / DataFrame plans over Parquet tables, plus the large-scale
training-data-pipeline operators (dedup, similarity search, text analysis,
multimodal plumbing, streaming) the 100 TB north star requires.

Layout:
    session     SparkSession factory tuned for scale (AQE, Arrow, UTC).
    catalog     Parquet table registry / temp-view registration.
    envelope    FetchResult result envelope (code 0 / -1 / -9999 semantics).
    gate        read-only SQL security gate + LIMIT override (fetch_sql).
    filters     OPTIMADE-style predicate-language parser -> Column compiler.
    functions   scalar/domain functions (formulas, space groups, text, vectors).
    operators   custom relational operators (fair quota, per-group top-k,
                dedup family, similarity join, as-of join, sessionize).
    sources     readers and sinks (JSON/CIF/manifest, tagged output dirs).
    ingest      ingestion-time normalization (canonical columns) and
                partitioned/bucketed storage layout writers.
    plans       typed parametric query builders (mofdb/openlam/bohrium shape).
    streaming   Structured Streaming ingestion + windowing helpers.
    multimodal  binary-column (image/audio/video) plumbing with stubbed codecs.
    golden      the golden query corpus (Spark plan + DuckDB oracle pairs).
"""

__version__ = "0.1.0"

from mr_dice_spark.catalog import Catalog, TABLE_NAMES
from mr_dice_spark.envelope import FetchResult, OK, ERROR, NO_RESULTS
from mr_dice_spark.session import get_spark

__all__ = [
    "Catalog",
    "TABLE_NAMES",
    "FetchResult",
    "OK",
    "ERROR",
    "NO_RESULTS",
    "get_spark",
]
