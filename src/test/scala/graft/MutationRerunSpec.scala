package graft

import org.scalatest.funsuite.AnyFunSuite

/** The untimed-base mutation keys reset to their pristine base with a
  * metadata-only restore on every invocation after the first (bench
  * discipline: the timed region measures the mutation, not the fixture
  * write). The restore path must produce EXACTLY the first run's
  * values — the bench times run 2, and the oracle only checks run 1,
  * so this spec is what pins the reset seam.
  */
class MutationRerunSpec extends AnyFunSuite {
  import SparkTestSession._

  private val keys = Seq("q_update_where", "q_update_mor", "q_merge_mor",
    "q_merge_evolve", "q_check_constraint", "q_ttl_expire", "q_replica_parity")

  for (k <- keys) test(s"$k: second invocation (restore path) repeats the first's values") {
    val fn = SparkEntry.queries(k)
    def run() = {
      val df = fn(spark, sfDir)
      df.collect().map(_.toString).sorted.toSeq
    }
    val first = run()
    val second = run()
    assert(first.nonEmpty && second == first,
      s"$k drifted across the metadata-only reset:\n1st=$first\n2nd=$second")
  }
}
