package graft.streaming

import java.util.Properties

import org.scalatest.funsuite.AnyFunSuite

import graft.{SparkTestSession, Tables}

/** Exactly-once JDBC delivery: replaying a micro-batch (same batch id)
  * leaves the table unchanged; distinct batches append. Runs against
  * embedded Derby like the batch JDBC sink specs.
  */
class IdempotentJdbcSinkSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  test("applyBatch is idempotent per batch id and appends across batch ids") {
    val url = "jdbc:derby:memory:eosink;create=true"
    val props = new Properties()
    // numeric columns only: Derby's dialect binds string NULLs as CLOB,
    // which is irrelevant to what this spec pins down
    val batch = Tables.eventsTsNs(spark, SparkTestSession.sf0001)
      .select("event_id", "user_id", "value")
    def count(): Long = {
      val conn = java.sql.DriverManager.getConnection(url, props)
      try {
        val rs = conn.createStatement().executeQuery("SELECT COUNT(*) FROM eo_events")
        rs.next(); rs.getLong(1)
      } finally conn.close()
    }

    IdempotentJdbcSink.applyBatch(batch, 0L, url, "eo_events", props)
    assert(count() == 1000)
    // crash-replay of the SAME batch: delete-then-append converges
    IdempotentJdbcSink.applyBatch(batch, 0L, url, "eo_events", props)
    assert(count() == 1000)
    // a partial write of batch 1 (simulated) followed by its full replay
    IdempotentJdbcSink.applyBatch(batch.limit(10), 1L, url, "eo_events", props)
    assert(count() == 1010)
    IdempotentJdbcSink.applyBatch(batch, 1L, url, "eo_events", props)
    assert(count() == 2000)
  }

  test("streaming path delivers each event exactly once end-to-end") {
    val url = "jdbc:derby:memory:eostream;create=true"
    val props = new Properties()
    val wd = java.nio.file.Files.createTempDirectory("eo_stream")
    val ckpt = java.nio.file.Files.createTempDirectory("eo_ckpt")
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(SparkTestSession.sf0001, "events.parquet"),
      wd.resolve("f1.parquet"))
    val stream = EventStream.readEvents(spark, wd.toString, SparkTestSession.sf0001)
      .select("event_id", "user_id", "value")
    val q = IdempotentJdbcSink.start(stream, url, "eo_stream_events", ckpt.toString, props)
    try {
      q.processAllAvailable()
      val conn = java.sql.DriverManager.getConnection(url, props)
      try {
        val rs = conn.createStatement().executeQuery(
          """SELECT COUNT(*), COUNT(DISTINCT "event_id") FROM eo_stream_events""")
        rs.next()
        assert(rs.getLong(1) == 1000 && rs.getLong(2) == 1000)
      } finally conn.close()
    } finally q.stop()
  }
}
