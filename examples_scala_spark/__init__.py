"""examples_scala_spark — a PySpark-native analytics engine with the
capability surface of streaming-with-flink/examples-scala.

The reference (/root/reference, the example repo for *Stream Processing
with Apache Flink*) exercises a set of streaming query semantics —
windows, watermarks, keyed state, timers, multi-stream correlation,
exactly-once sinks — via the Flink DataStream API. This package
re-expresses that surface Spark-first:

- relational / window ops      -> DataFrame API + Catalyst (operators/)
- scalar function surface      -> pyspark.sql.functions wrappers (functions/)
- sources (sensor generators)  -> rate / rate-micro-batch streams and
                                  deterministic batch twins (sources/)
- stateful per-record ops      -> applyInPandasWithState (streaming/)
- plan hygiene helpers         -> plans/

Beyond parity, operators/ adds the large-scale training-data pipeline
surface: dedup (exact, MinHash-LSH, SimHash, n-gram Jaccard, embedding
cosine), similarity search (brute-force + LSH-bucketed ANN), text
analysis, and multimodal binary-column plumbing.

Every operator is designed for a 1000-executor / 100 TB deployment:
declarative plans (Catalyst prunes + pushes down), broadcast joins for
small dimensions, shuffle-minimal aggregation, and Arrow-batched Python
only where the JVM cannot express the semantics.
"""

__version__ = "0.1.0"
