package graft

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

/** Algebraic laws (SURVEY §5.2.3) checked over scalacheck-generated small
  * tables (fixed seeds — deterministic CI).
  */
class LawsSpec extends AnyFunSuite {
  import SparkTestSession._
  import spark.implicits._

  private val listGen = Gen.listOfN(30, Gen.choose(-50L, 50L))

  /** Deterministic samples from a generator. */
  private def samples[A](g: Gen[A], n: Int): Seq[A] =
    (1 to n).map(i => g.apply(Gen.Parameters.default, Seed(i.toLong)).get)

  test("filter pushdown equivalence: filter(join) == join(filter) on both sides") {
    for (xs <- samples(listGen, 5)) {
      val l = xs.toDF("k")
      val r = xs.map(x => (x, x * 2)).toDF("k", "v")
      val a = l.join(r, "k").filter(col("k") > 0).count()
      val b = l.filter(col("k") > 0).join(r.filter(col("k") > 0), "k").count()
      assert(a == b)
    }
  }

  test("union-all cardinality is additive") {
    for (Seq(xs, ys) <- samples(listGen, 10).grouped(2).toSeq) {
      assert(xs.toDF("k").union(ys.toDF("k")).count() == xs.length + ys.length)
    }
  }

  test("keyed dedup is idempotent (applying twice == once)") {
    for (xs <- samples(listGen, 5)) {
      val df = xs.zipWithIndex.map { case (v, i) => (v, i.toLong) }.toDF("k", "seq")
      def dedup(d: org.apache.spark.sql.DataFrame) = {
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy("k").orderBy("seq")
        d.withColumn("rn", row_number().over(w)).filter(col("rn") === 1).drop("rn")
      }
      val once = dedup(df).orderBy("k", "seq").collect().toSeq
      val twice = dedup(dedup(df)).orderBy("k", "seq").collect().toSeq
      assert(once == twice)
    }
  }

  test("sort-limit equals top-k for any k") {
    for ((xs, k) <- samples(listGen, 5).zip(samples(Gen.choose(1, 10), 5))) {
      val df = xs.zipWithIndex.map { case (v, i) => (v, i.toLong) }.toDF("v", "id")
      val sorted = df.orderBy(col("v").desc, col("id").asc).collect().take(k).toSeq
      val topk = df.orderBy(col("v").desc, col("id").asc).limit(k).collect().toSeq
      assert(sorted == topk)
    }
  }

  test("rollup row-set is a superset of the plain group-by") {
    for (xs <- samples(listGen, 5)) {
      val df = xs.map(x => (x % 3, x % 5, x)).toDF("a", "b", "v")
      val plain = df.groupBy("a", "b").agg(sum("v")).count()
      val roll = df.rollup("a", "b").agg(sum("v")).count()
      assert(roll >= plain)
    }
  }

  test("binned range-join decomposition is lossless (== naive inequality join)") {
    // the q_join_range_binned claim: exploding the probe into the ≤2
    // window-width bins it covers + equi-join on the bin + residual
    // filter finds each qualifying pair EXACTLY once — stressed here on
    // random timestamps that land on and around bin boundaries
    val tsGen = Gen.listOfN(60, Gen.choose(0L, 300L))
    for (xs <- samples(tsGen, 5)) {
      val w = 60L
      val e = xs.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("id", "se")
      val naive = e.as("a").join(e.as("b"),
          col("b.se") > col("a.se") && col("b.se") <= col("a.se") + w)
        .select(col("a.id").as("ia"), col("b.id").as("ib"))
      val probe = e.select(col("id").as("ia"), col("se"),
        explode(array(expr(s"se div $w"), expr(s"se div $w + 1"))).as("bin"))
      val build = e.select(col("id").as("ib"), col("se").as("se2"),
        expr(s"se div $w").as("bin"))
      val binned = probe.join(build, Seq("bin"))
        .filter(col("se2") > col("se") && col("se2") <= col("se") + w)
        .select(col("ia"), col("ib"))
      assert(binned.count() == naive.count())
      assert(binned.except(naive).count() == 0 && naive.except(binned).count() == 0)
    }
  }

  test("hash sampling is monotone: raising the threshold strictly grows the sample") {
    // the Sampling-family consistency law: a row admitted at threshold t
    // stays admitted at every t' > t, because membership is a pure
    // function of the row's bucket — the property that lets a pipeline
    // raise its sampling rate WITHOUT resampling history (seeded
    // df.sample has no such guarantee)
    graft.functions.VectorKernels.ensureRegistered(spark)
    val docs = Tables.documents(spark, sfDir)
      .select(col("doc_id"), expr("graft_hash_bucket(text)").as("b"))
    val at16k = docs.filter(col("b") < 16384).select("doc_id")
    val at32k = docs.filter(col("b") < 32768).select("doc_id")
    assert(at16k.except(at32k).count() == 0, "smaller sample must be a subset")
    assert(at32k.count() > at16k.count(), "larger threshold must admit more rows")
  }

  test("target-mix acceptance keeps the binding language whole and never over-keeps") {
    // with rate p_s·n_b/(p_b·n_s): the binding language passes 100% of
    // its rows (bucket·p_b·n_b < 65536·p_b·n_b always), and no language's
    // kept count exceeds its population
    val out = SparkEntry.queries("q_sample_target_mix")(spark, sfDir).collect()
    assert(out.nonEmpty)
    val rows = out.map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(rows.forall { case (_, n, kept) => kept <= n })
    assert(rows.exists { case (_, n, kept) => kept == n },
      "some (binding) language must be kept whole")
  }
}
