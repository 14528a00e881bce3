package graft.streaming

import graft.SparkTestBase
import org.apache.spark.sql.{DataFrame, SparkSession}

/** The 100 TB state backend: at scale, streaming state (sessionization
  * over billions of users, stream-stream join buffers over hours of
  * traffic) does not fit executor heap — the deployment answer is the
  * RocksDB state store (state lives off-heap/on-disk per partition,
  * checkpointed incrementally). The engine treats the backend as a
  * deployment property: set `spark.sql.streaming.stateStore.providerClass`
  * on the session and every streaming operator runs unchanged.
  *
  * These pins run one gate from each STATE SHAPE family under RocksDB
  * and require byte-identical results vs the default HDFS-backed store:
  *   - windowed aggregation state (windowedCountsSync)
  *   - flatMapGroupsWithState custom state (sessionizeSync)
  *   - stream-stream join buffers, 4 stores/partition (attributionJoinOuterSync)
  */
class RocksDbStateSpec extends SparkTestBase {

  private val Sf = "/root/testdata/sf0.001"
  private val ProviderKey = "spark.sql.streaming.stateStore.providerClass"
  private val RocksDb =
    "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"

  private def rocksSession(): SparkSession = {
    val s = spark.newSession()
    s.conf.set(ProviderKey, RocksDb)
    s
  }

  private def sortedRows(df: DataFrame): Seq[String] =
    df.collect().map(_.toSeq.map(String.valueOf).mkString("|")).toSeq.sorted

  test("windowed aggregation state: RocksDB ≡ default backend") {
    val expected = sortedRows(EventPipeline.windowedCountsSync(spark, Sf))
    val got = sortedRows(EventPipeline.windowedCountsSync(rocksSession(), Sf))
    assert(got === expected)
    assert(got.nonEmpty)
  }

  test("flatMapGroupsWithState session state: RocksDB ≡ default backend") {
    val expected = sortedRows(EventPipeline.sessionizeSync(spark, Sf))
    val got = sortedRows(EventPipeline.sessionizeSync(rocksSession(), Sf))
    assert(got === expected)
    assert(got.nonEmpty)
  }

  test("stream-stream join buffers: RocksDB ≡ default backend") {
    val expected = sortedRows(EventPipeline.attributionJoinOuterSync(spark, Sf))
    val got = sortedRows(EventPipeline.attributionJoinOuterSync(rocksSession(), Sf))
    assert(got === expected)
    assert(got.nonEmpty)
  }
}
