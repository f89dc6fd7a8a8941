"""Driver-contract query definitions, grouped by operator family.

Importing this package registers every QuerySpec (see sptag_spark.registry).
"""

import sptag_spark.queries.agg_queries  # noqa: F401
import sptag_spark.queries.ann_queries  # noqa: F401
import sptag_spark.queries.dedup_queries  # noqa: F401
import sptag_spark.queries.knn_queries  # noqa: F401
import sptag_spark.queries.misc_queries  # noqa: F401
import sptag_spark.queries.text_queries  # noqa: F401
import sptag_spark.queries.multi_queries  # noqa: F401
import sptag_spark.queries.mutation_queries  # noqa: F401
import sptag_spark.queries.retrieval_queries  # noqa: F401
import sptag_spark.queries.server_queries  # noqa: F401
import sptag_spark.queries.streaming_queries  # noqa: F401
