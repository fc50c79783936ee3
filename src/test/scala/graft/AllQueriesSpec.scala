package graft

import org.scalatest.funsuite.AnyFunSuite

/** One test per declared operator key (SURVEY §2.2): every entry in
  * SparkEntry.queries must plan, execute, and produce a well-formed
  * result at sf0.001. Oracle-declared keys additionally re-execute to
  * confirm the result is deterministic (same rows both runs) — the
  * property the driver's hash-compare depends on.
  */
class AllQueriesSpec extends AnyFunSuite {
  import SparkTestSession._

  // keys whose queries spin up real streaming runs — executed once (slow)
  private val streamingKeys = Set(
    "stream_file_ingest", "stream_watermark_late", "stream_dedup_state",
    "stream_static_join", "stream_stateful_count", "stream_stream_join",
    "stream_funnel_state")

  for (key <- SparkEntry.queries.keys.toSeq.sorted) {
    test(s"$key executes at sf0.001") {
      val df = SparkEntry.queries(key)(spark, sfDir)
      assert(df.columns.nonEmpty, "result must have a schema")
      val rows = df.collect()
      assert(rows != null)
      if (SparkEntry.oracleSql.contains(key) && !streamingKeys.contains(key)) {
        val again = SparkEntry.queries(key)(spark, sfDir).collect()
        assert(rows.toSeq == again.toSeq, s"$key must be deterministic")
      }
    }
  }

  test("every oracle key has a queries entry") {
    val orphans = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(orphans.isEmpty, s"oracle without query: $orphans")
  }

  test("entry (flagship) returns rows on sf0.001") {
    assert(SparkEntry.entry(spark).count() > 0)
  }
}
