package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Column-privacy operators: the sha2 token must be a stable injective-ish
  * pseudonym (referential integrity survives tokenization) and the AES
  * path must round-trip exactly (reversible protection — the property an
  * oracle cannot check because GCM ciphertext is IV-randomized).
  */
class PrivacySpec extends AnyFunSuite {
  import SparkTestSession._

  test("aes_encrypt/aes_decrypt round-trips every customer name") {
    val df = ops.Privacy.aesRoundTrip(
      Tables.customer(spark, sfDir).select("c_custkey", "c_name"),
      "c_name", "0123456789abcdef")
    assert(df.filter(col("_rt") =!= col("c_name") || col("_rt").isNull).count() == 0)
    assert(df.count() > 0)
  }

  test("ciphertext differs from plaintext (the column is actually protected)") {
    val df = Tables.customer(spark, sfDir)
      .withColumn("ct", expr("aes_encrypt(c_name, '0123456789abcdef')"))
    assert(df.filter(expr("CAST(ct AS STRING) = c_name")).count() == 0)
  }

  private val k1 = "0123456789abcdef"
  private val k2 = "fedcba9876543210"
  private def pii = Tables.customer(spark, sfDir)
    .select(col("c_custkey"), col("c_name")).limit(200)

  test("secret rotation: rows encrypted under v1 and v2 decrypt side by side") {
    import ops.{InMemorySecretProvider, Privacy}
    val p1 = new InMemorySecretProvider(Map("cape_privacy_key" -> Seq(1 -> k1)))
    val p2 = new InMemorySecretProvider(Map("cape_privacy_key" -> Seq(1 -> k1, 2 -> k2)))
    val oldRows = Privacy.encryptWith(pii.filter(col("c_custkey") <= 100),
      "c_name", p1, "cape_privacy_key")
    val newRows = Privacy.encryptWith(pii.filter(col("c_custkey") > 100),
      "c_name", p2, "cape_privacy_key")
    assert(oldRows.select("c_name_key_ver").distinct().collect().map(_.getInt(0)).toSeq == Seq(1))
    assert(newRows.select("c_name_key_ver").distinct().collect().map(_.getInt(0)).toSeq == Seq(2))
    // cross-rotation decrypt: both populations recover their plaintext
    val decrypted = Privacy.decryptWith(oldRows.unionByName(newRows),
      "c_name", p2, "cape_privacy_key")
    val mismatches = decrypted.join(pii.withColumnRenamed("c_name", "expected"),
      Seq("c_custkey"))
      .filter(col("c_name") =!= col("expected") || col("c_name").isNull)
    assert(mismatches.count() == 0 && decrypted.count() == pii.count())
  }

  test("key material never appears in any plan string (SecretKeyRef, not a literal)") {
    import ops.{InMemorySecretProvider, Privacy}
    val p = new InMemorySecretProvider(Map("cape_privacy_key" -> Seq(1 -> k1, 2 -> k2)))
    val enc = Privacy.encryptWith(pii, "c_name", p, "cape_privacy_key")
    val dec = Privacy.decryptWith(enc, "c_name", p, "cape_privacy_key")
    for (df <- Seq(enc, dec)) {
      val qe = df.queryExecution
      val rendered = Seq(qe.logical, qe.analyzed, qe.optimizedPlan, qe.executedPlan)
        .map(_.toString).mkString("\n") + qe.explainString(
          org.apache.spark.sql.execution.ExtendedMode)
      for (k <- Seq(k1, k2))
        assert(!rendered.contains(k), s"key material leaked into a plan string")
      // the reference stays legible for debugging: name + version visible
      assert(rendered.contains("graft_secret_key"), rendered.take(500))
    }
    // and the hardened path still round-trips
    assert(dec.join(pii.withColumnRenamed("c_name", "expected"), Seq("c_custkey"))
      .filter(col("c_name") =!= col("expected")).count() == 0)
  }

  test("rotate() re-encrypts everything under the current version; the retired key can then be destroyed") {
    import ops.{InMemorySecretProvider, Privacy}
    val p1 = new InMemorySecretProvider(Map("cape_privacy_key" -> Seq(1 -> k1)))
    val p2 = new InMemorySecretProvider(Map("cape_privacy_key" -> Seq(1 -> k1, 2 -> k2)))
    val rotated = Privacy.rotate(
      Privacy.encryptWith(pii, "c_name", p1, "cape_privacy_key"),
      "c_name", p2, "cape_privacy_key")
    assert(rotated.select("c_name_key_ver").distinct().collect().map(_.getInt(0)).toSeq == Seq(2))
    // v1 destroyed: versions stay STABLE identifiers, v2 still resolves
    val p3 = new InMemorySecretProvider(Map("cape_privacy_key" -> Seq(2 -> k2)))
    val decrypted = Privacy.decryptWith(rotated, "c_name", p3, "cape_privacy_key")
    val mismatches = decrypted.join(pii.withColumnRenamed("c_name", "expected"),
      Seq("c_custkey"))
      .filter(col("c_name") =!= col("expected") || col("c_name").isNull)
    assert(mismatches.count() == 0 && decrypted.count() == pii.count())
  }

  test("decrypt fails loudly when a row's recorded version is no longer live") {
    import ops.{InMemorySecretProvider, Privacy}
    val p1 = new InMemorySecretProvider(Map("cape_privacy_key" -> Seq(1 -> k1)))
    val enc = Privacy.encryptWith(pii, "c_name", p1, "cape_privacy_key")
    // v1 destroyed WITHOUT rotating first — decrypt must raise, not null out
    val pDestroyed = new InMemorySecretProvider(Map("cape_privacy_key" -> Seq(2 -> k2)))
    val e = intercept[Exception] {
      Privacy.decryptWith(enc, "c_name", pDestroyed, "cape_privacy_key").collect()
    }
    assert(e.getMessage != null && e.getMessage.contains("no live version"),
      s"unexpected failure: ${e.getMessage}")
  }

  test("provider version lookups are stable identifiers, not positions") {
    import ops.InMemorySecretProvider
    // v1 destroyed, v3 current: key(3) must resolve to k2, key(1) must throw
    val p = new InMemorySecretProvider(Map("s" -> Seq(3 -> k2, 2 -> k1)))
    assert(p.currentVersion("s") == 3 && p.currentKey("s") == k2)
    assert(p.key("s", 2) == k1)
    intercept[NoSuchElementException](p.key("s", 1))
    intercept[NoSuchElementException](p.secret("unknown"))
  }

  test("fromEnv mangles the secret name and parses ver:key pairs") {
    import ops.SecretProvider
    // explicit ver:key pairs with a destroyed v2
    val p = SecretProvider.fromEnv(Map(
      "GRAFT_SECRET_CAPE_PRIVACY_KEY" -> s"1:$k1,3:$k2"))
    assert(p.secret("cape_privacy_key") == Seq(1 -> k1, 3 -> k2))
    assert(p.currentVersion("cape_privacy_key") == 3)
    intercept[NoSuchElementException](p.key("cape_privacy_key", 2))
    // bare list → positional numbering
    val bare = SecretProvider.fromEnv(Map("GRAFT_SECRET_K" -> s"$k1,$k2"))
    assert(bare.secret("k") == Seq(1 -> k1, 2 -> k2))
    // unknown name / unset env
    intercept[NoSuchElementException](p.secret("other_key"))
    // mixed formats rejected
    intercept[IllegalArgumentException](
      SecretProvider.fromEnv(Map("GRAFT_SECRET_K" -> s"$k1,2:$k2")).secret("k"))
  }

  test("sha2 tokenization is deterministic and distinct-preserving") {
    val masked = ops.Privacy.queries("q_mask_sensitive")(spark, sfDir)
    val c = Tables.customer(spark, sfDir)
    // deterministic: re-running yields the identical token set
    val again = ops.Privacy.queries("q_mask_sensitive")(spark, sfDir)
    assert(masked.exceptAll(again).isEmpty && again.exceptAll(masked).isEmpty)
    // distinct-preserving on this corpus: as many tokens as distinct names
    val nNames = c.select("c_name").distinct().count()
    val nTokens = masked.select("name_token").distinct().count()
    assert(nTokens == nNames, s"tokens=$nTokens names=$nNames")
    // raw PII does not appear in the masked output
    assert(masked.columns.toSet.intersect(Set("c_name", "c_phone")).isEmpty)
  }
}
