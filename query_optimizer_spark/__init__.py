"""spark-joinlab: a PySpark-native join-order optimization engine.

A from-scratch rebuild of the capabilities of the public reference
``parimarjan/query-optimizer`` (a Calcite/Postgres join-order research
harness), re-expressed Spark-first:

- ``sqlparse``    : mini SQL parser for SPJA (select-project-join-aggregate)
                    queries -> ParsedQuery (replaces Calcite parse/validate).
- ``joingraph``   : JoinGraph IR (replaces QueryGraph.java).
- ``oracle``      : cardinality oracles -- injected dict, true counts,
                    Spark catalog stats (replaces MyMetadataQuery.java).
- ``costmodels``  : C_out / CM2 / MM cost models (replaces
                    MyMetadataQuery.java cost methods + MyCostFactory.java).
- ``planners``    : greedy, DPccp, left-deep DP, branch-and-bound, random
                    (replaces the five Calcite rules).
- ``env``         : gym-style JoinOrderEnv (replaces ZeroMQServer.java RPC).
- ``executor``    : plan tree -> explicit DataFrame join chain + harness
                    (replaces QueryOptExperiment.java / MyUtils.java).
- ``functions``   : large-scale data-pipeline operators (dedup, similarity,
                    text analysis, multimodal) beyond the reference surface.
- ``streaming``   : Structured Streaming operators over the events table.

Everything derives from public knowledge only: the Apache Spark / PySpark
API, the public reference repo, and published papers (Moerkotte & Neumann
DPccp; Selinger et al.; Krishnan et al. DQ; Broder MinHash; Charikar SimHash).
"""

__version__ = "0.1.0"

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)
