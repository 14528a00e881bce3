package graft.queries

import graft.Tables
import graft.functions.GraftFunctions
import graft.operators.{Clusters, Decontaminate, Dedup, Dsir, Multimodal, Pii, Pq, Similarity, Spans, Urls}
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._

/** LLM-data-pipeline operators on the driver fixtures (north-star ops,
  * SURVEY §2.3): text analysis, dedup (exact → MinHash/SimHash/Jaccard →
  * embedding), similarity search, multimodal plumbing. Text/dedup queries
  * that use only engine-portable primitives carry DuckDB oracles; the
  * hash/LSH/float families are deterministic but engine-specific, so the
  * driver records their rows-only check and scalatest verifies their
  * semantics against exact references. */
object LlmOps extends LlmTextDedupOps with LlmSketchAnnOps
  with LlmIngestCurationOps with LlmModelInfraOps
